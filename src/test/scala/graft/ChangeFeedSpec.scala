package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Change feed over the postings commit log: per-generation additions,
  * window semantics, torn-append invisibility, additions-only deletes.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c"), (2L, "b c d"), (3L, "c d e"),
    (4L, "d e f g"), (5L, "e f"), (6L, "f g h")
  ).toDF("doc_id", "text")

  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    Retrieval.savePostingsIndexCommitted(
      Retrieval.buildPostingsIndex(docs.filter($"doc_id" <= 2),
        "doc_id", "text", nBuckets = 4), dir)
    Retrieval.appendPostingsIndexCommitted(spark, dir,
      docs.filter($"doc_id" === 3 || $"doc_id" === 4), "doc_id", "text")
    Retrieval.appendPostingsIndexCommitted(spark, dir,
      docs.filter($"doc_id" === 5), "doc_id", "text")
    dir
  }

  private def feed(dir: String, from: Long, to: Long): Set[(Long, Long, Long)] =
    Retrieval.postingsAdditions(spark, dir, from, to)
      .as[(Long, Long, Long)].collect().toSet

  test("each committed generation reports exactly its batch, with doc lengths") {
    val dir = freshStore()
    assert(feed(dir, 0, 2) ==
      Set((1L, 3L, 3L), (1L, 4L, 4L), (2L, 5L, 2L)))
    // partial windows slice the log
    assert(feed(dir, 0, 1) == Set((1L, 3L, 3L), (1L, 4L, 4L)))
    assert(feed(dir, 1, 2) == Set((2L, 5L, 2L)))
    // the save itself is generation 0
    assert(feed(dir, -1, 0).map(_._2) == Set(1L, 2L))
    // empty window → empty feed
    assert(feed(dir, 2, 2).isEmpty)
  }

  test("a torn append never enters the feed; the next committed one does") {
    val dir = freshStore()
    // torn: data files land, no manifest row
    Retrieval.appendPostingsIndex(spark, dir,
      docs.filter($"doc_id" === 6), "doc_id", "text")
    assert(feed(dir, 0, 99).map(_._2) == Set(3L, 4L, 5L))
    val g = Retrieval.appendPostingsIndexCommitted(spark, dir,
      docs.filter($"doc_id" === 6), "doc_id", "text")
    assert(feed(dir, 2, g).map(_._2) == Set(6L))
  }

  test("deletes ride the tombstone ledger, not the additions feed") {
    val dir = freshStore()
    Retrieval.deleteFromPostingsIndex(spark, dir,
      docs.filter($"doc_id" === 3).select($"doc_id"), "doc_id")
    // the feed is append-history, unchanged by the delete …
    assert(feed(dir, 0, 2).map(_._2) == Set(3L, 4L, 5L))
    // … and the consumer reads removals from the ledger
    val tombs = graft.operators.StoreFiles
      .readTombstones(spark, s"$dir/tombstones")
    assert(tombs.isDefined &&
      tombs.get.select("doc_id").as[Long].collect().toSet == Set(3L))
  }
}
