package graft

import graft.arxiv._
import org.apache.spark.sql.functions._

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val clock = to_date(lit("2026-01-15"))

  test("streaming ingest over a landing dir matches batch ingest") {
    val fixture = getClass.getResource("/dataset.json").getPath
    val landing = java.nio.file.Files.createTempDirectory("arxiv_landing")
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("dataset.json"), java.nio.file.Paths.get(fixture))

    val streamed = StreamingIngest.run(spark, landing.toString,
      ArxivStore.empty(spark), clock)
    val batch = Ingest.run(spark, ArxivStore.empty(spark), fixture, clock)

    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy(df.columns.map(col).toSeq: _*).collect().map(_.toString).toSeq
    assert(sig(streamed.publications) == sig(batch.publications))
    assert(sig(streamed.authorship) == sig(batch.authorship))
    assert(sig(streamed.categories) == sig(batch.categories))
  }

  test("second JSON drop ingests incrementally: ids continue, conflicts resolved as in batch") {
    val fixture = getClass.getResource("/dataset.json").getPath
    val landing = java.nio.file.Files.createTempDirectory("arxiv_landing3")
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("dataset.json"), java.nio.file.Paths.get(fixture))
    val ckpt = java.nio.file.Files.createTempDirectory("arxiv_ckpt3").toString

    // day 1: the base drop
    val s1 = StreamingIngest.run(spark, landing.toString,
      ArxivStore.empty(spark), clock, checkpointDir = Some(ckpt))
    val n1 = s1.publications.count()
    val maxId1 = s1.publications.agg(max($"id")).head().getLong(0)
    val existingDoi = s1.publications.filter($"doi".isNotNull)
      .select($"doi").as[String].head()

    // day 2 drop: one genuinely new record + one doi-conflicting record
    val drop2 =
      s"""[
         |{"id":"r2.0001","submitter":"sub2","authors":"R Two, S Three",
         | "title":"A brand new round-two title","comments":null,
         | "journal-ref":null,"doi":"10.9999/r2.1","report-no":null,
         | "categories":"cs.AI","license":null,"abstract":"new in drop 2",
         | "versions":[],"update_date":"2026-02-01","authors_parsed":[]},
         |{"id":"r2.0002","submitter":"sub2","authors":"T Four",
         | "title":"A conflicting round-two title","comments":null,
         | "journal-ref":null,"doi":"$existingDoi","report-no":null,
         | "categories":"cs.DB","license":null,"abstract":"dup doi",
         | "versions":[],"update_date":"2026-02-01","authors_parsed":[]}
         |]""".stripMargin
    java.nio.file.Files.writeString(landing.resolve("drop2.json"), drop2)

    val s2 = StreamingIngest.run(spark, landing.toString, s1, clock,
      checkpointDir = Some(ckpt))
    // exactly the non-conflicting record landed, with the next SERIAL id
    assert(s2.publications.count() == n1 + 1)
    val newRow = s2.publications.filter($"title" === "A brand new round-two title")
    assert(newRow.select($"id").as[Long].head() == maxId1 + 1)
    assert(s2.publications.filter($"doi" === existingDoi).count() == 1)

    // and the incremental result equals running batch ingest on both drops
    val batch = Ingest.run(spark,
      Ingest.run(spark, ArxivStore.empty(spark), fixture, clock),
      landing.resolve("drop2.json").toString, clock)
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy(df.columns.map(col).toSeq: _*).collect().map(_.toString).toSeq
    assert(sig(s2.publications) == sig(batch.publications))
    assert(sig(s2.authorship) == sig(batch.authorship))
  }

  test("second AvailableNow run over the same checkpoint is a no-op") {
    val fixture = getClass.getResource("/dataset.json").getPath
    val landing = java.nio.file.Files.createTempDirectory("arxiv_landing2")
    java.nio.file.Files.createSymbolicLink(
      landing.resolve("dataset.json"), java.nio.file.Paths.get(fixture))
    val ckpt = java.nio.file.Files.createTempDirectory("arxiv_ckpt").toString

    val s1 = StreamingIngest.run(spark, landing.toString,
      ArxivStore.empty(spark), clock, checkpointDir = Some(ckpt))
    val n1 = s1.publications.count()
    // replay with the same checkpoint: the file is already committed, so
    // no batch fires and the store is unchanged
    val s2 = StreamingIngest.run(spark, landing.toString, s1, clock,
      checkpointDir = Some(ckpt))
    assert(s2.publications.count() == n1)
  }
}
