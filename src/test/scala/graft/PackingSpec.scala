package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Sequence packing (GPT concat-and-chunk): hand-checked spans on a
  * fixture, the chunk/document partition invariants on real data, and
  * determinism of the two-phase distributed offset scan.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")
    .withColumn("n_tokens",
      graft.functions.TextAnalysis.tokenCount($"text").cast("long"))

  test("hand-checked spans: documents cross chunk boundaries correctly") {
    // stream: a(0..6) b(7..9) c(10..24) — L=8 ⇒ chunks 0..3 (25 tokens)
    val d = Seq((1L, 7L), (2L, 3L), (3L, 15L)).toDF("doc_id", "n_tokens")
    val out = Layout.packSequences(d, "doc_id", "n_tokens", seqLen = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 1L, 0L, 0L, 7L),  // a fills chunk 0 positions 0..6
      (0L, 2L, 0L, 7L, 1L),  // b's first token closes chunk 0
      (1L, 2L, 1L, 0L, 2L),  // b's tail opens chunk 1
      (1L, 3L, 0L, 2L, 6L),  // c fills the rest of chunk 1...
      (2L, 3L, 6L, 0L, 8L),  // ...all of chunk 2...
      (3L, 3L, 14L, 0L, 1L)  // ...and one token of chunk 3
    ))
  }

  test("zero-token documents are dropped; empty input packs to empty") {
    val d = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "n_tokens")
    val out = Layout.packSequences(d, "doc_id", "n_tokens", seqLen = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 2L, 0L, 0L, 4L), (1L, 2L, 4L, 0L, 1L)))
    assert(Layout.packSequences(d.filter($"n_tokens" < 0), "doc_id",
      "n_tokens", seqLen = 4).count() == 0L)
  }

  test("real corpus: every chunk except the last covers exactly L; " +
      "every document's spans reconstruct it contiguously; deterministic") {
    val L = 64
    val out = Layout.packSequences(docs, "doc_id", "n_tokens", L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val lastChunk = out.map(_._1).max
    // chunk coverage: sum(len) == L, spans tile [0, L) without overlap
    out.groupBy(_._1).foreach { case (c, spans) =>
      val total = spans.map(_._5).sum
      if (c < lastChunk) assert(total == L, s"chunk $c covers $total != $L")
      else assert(total <= L)
      val tiles = spans.sortBy(_._4)
      assert(tiles.head._4 == 0L)
      tiles.sliding(2).foreach {
        case Array(x, y) => assert(x._4 + x._5 == y._4,
          s"chunk $c: span gap/overlap between $x and $y")
        case _ =>
      }
    }
    // document reconstruction: spans tile [0, n_tokens) in chunk order
    val nTok = docs.filter($"n_tokens" > 0)
      .select($"doc_id", $"n_tokens".cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(out.map(_._2).toSet == nTok.keySet)
    out.groupBy(_._2).foreach { case (id, spans) =>
      val tiles = spans.sortBy(_._1) // chunk order IS document order
      assert(tiles.head._3 == 0L)
      tiles.sliding(2).foreach {
        case Array(x, y) => assert(x._3 + x._5 == y._3)
        case _ =>
      }
      assert(tiles.map(_._5).sum == nTok(id), s"doc $id not fully covered")
    }
    // two-phase scan is deterministic across runs
    val again = Layout.packSequences(docs, "doc_id", "n_tokens", L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
  }
}
