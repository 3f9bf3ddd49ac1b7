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
