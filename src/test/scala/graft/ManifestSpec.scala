package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Snapshot-manifest commits for the postings index: the manifest
  * row-file is the commit point, so a torn append (data files, no
  * manifest row) is invisible to snapshot readers, visible to raw
  * directory readers — and compaction drops the orphans instead of
  * resurrecting them.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs distributed queries over columnar data"),
    (2L, "spark queries shuffle data between executors"),
    (3L, "ducks swim over the pond water"),
    (4L, "columnar data formats compress well"),
    (5L, "the pond water reflects the spark of dawn light"),
    (6L, "executors cache columnar data for spark queries")
  ).toDF("doc_id", "text")

  private val queries = Seq(
    (100L, Seq("spark", "data")),
    (200L, Seq("pond", "water", "columnar"))
  ).toDF("qid", "qterms")

  private def serveSnap(dir: String): Set[(Long, Long, Long, Int)] =
    Retrieval.bm25SearchIndex(queries,
        Retrieval.loadPostingsIndexSnapshot(spark, dir), "qid", "qterms",
        k = 6)
      .as[(Long, Long, Long, Int)].collect().toSet

  private def serveRaw(dir: String): Set[(Long, Long, Long, Int)] =
    Retrieval.bm25SearchIndex(queries,
        Retrieval.loadPostingsIndex(spark, dir), "qid", "qterms", k = 6)
      .as[(Long, Long, Long, Int)].collect().toSet

  private def inflight(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int)] =
    Retrieval.bm25TopK(docs, queries, "doc_id", "text", "qid", "qterms",
        k = 6)
      .as[(Long, Long, Long, Int)].collect().toSet

  test("committed appends serve identically through snapshot and raw loads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    Retrieval.savePostingsIndexCommitted(
      Retrieval.buildPostingsIndex(corpus.filter(col("doc_id") <= 4),
        "doc_id", "text", nBuckets = 4), dir)
    Retrieval.appendPostingsIndexCommitted(spark, dir,
      corpus.filter(col("doc_id") > 4), "doc_id", "text")
    val want = inflight(corpus)
    assert(serveSnap(dir) == want)
    assert(serveRaw(dir) == want)
  }

  test("a torn append is invisible to snapshot readers, visible raw; compaction drops the orphans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_torn").toString
    Retrieval.savePostingsIndexCommitted(
      Retrieval.buildPostingsIndex(corpus.filter(col("doc_id") <= 4),
        "doc_id", "text", nBuckets = 4), dir)
    // the torn writer: plain append lands data files, no manifest row
    Retrieval.appendPostingsIndex(spark, dir,
      corpus.filter(col("doc_id") > 4), "doc_id", "text")
    val committed = inflight(corpus.filter(col("doc_id") <= 4))
    assert(serveSnap(dir) == committed)
    // the raw directory reader DOES see the torn batch — the contrast
    // that makes the manifest the commit point
    assert(serveRaw(dir) == inflight(corpus))
    assert(serveRaw(dir) != committed)
    // compaction rewrites the COMMITTED snapshot: orphans gone from the
    // raw directory too, manifest regenerated, snapshot serve unchanged
    Retrieval.compactPostingsIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id") > 4).count() == 0)
    assert(serveSnap(dir) == committed)
    assert(serveRaw(dir) == committed)
    // the store keeps working: a later committed append serves
    Retrieval.appendPostingsIndexCommitted(spark, dir,
      corpus.filter(col("doc_id") > 4), "doc_id", "text")
    assert(serveSnap(dir) == inflight(corpus))
  }

  test("tombstone deletes compose with snapshot loads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_del").toString
    Retrieval.savePostingsIndexCommitted(
      Retrieval.buildPostingsIndex(corpus, "doc_id", "text", nBuckets = 4),
      dir)
    Retrieval.deleteFromPostingsIndex(spark, dir,
      Seq(2L, 4L).toDF("doc_id"), "doc_id")
    assert(serveSnap(dir) ==
      inflight(corpus.filter(!col("doc_id").isin(2L, 4L))))
  }
}
