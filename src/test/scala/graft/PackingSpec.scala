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

  test("packBins hand-checked: class ranks, dense bin numbering, " +
      "oversize and zero-token docs excluded") {
    // C=10: k=1 docs (10, 6) → bins 0,1; k=2 docs (5, 5) → bin 2;
    // k=3 docs (3, 3, 3) → bin 3; k=5 doc (2) → bin 4; 11 and 0 drop
    val d = Seq((1L, 10L), (2L, 6L), (3L, 5L), (4L, 5L), (5L, 3L),
      (6L, 3L), (7L, 3L), (8L, 2L), (9L, 11L), (10L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = Layout.packBins(d, "doc_id", "n_tokens", capacity = 10)
      .select($"bin_id", $"doc_id", $"slot", $"n_tokens", $"slots")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 1L, 0L, 10L, 1L), (1L, 2L, 0L, 6L, 1L),
      (2L, 3L, 0L, 5L, 2L), (2L, 4L, 1L, 5L, 2L),
      (3L, 5L, 0L, 3L, 3L), (3L, 6L, 1L, 3L, 3L), (3L, 7L, 2L, 3L, 3L),
      (4L, 8L, 0L, 2L, 5L)))
  }

  test("packBins real corpus: every doc placed once, bins never " +
      "overflow, all but the last bin per class are full and > C/2, " +
      "deterministic") {
    val C = 128
    val out = Layout.packBins(docs, "doc_id", "n_tokens", C)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // exactly the packable docs, each exactly once
    val expected = docs.filter($"n_tokens" >= 1 && $"n_tokens" <= C)
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_._2).toSet == expected)
    assert(out.map(_._2).length == expected.size)
    // capacity: sum of tokens per bin <= C; slots agree within a bin
    out.groupBy(_._1).foreach { case (bin, rows) =>
      assert(rows.map(_._4).sum <= C, s"bin $bin overflows")
      assert(rows.map(_._5).toSet.size == 1, s"bin $bin mixes classes")
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"bin $bin slots not dense")
    }
    // per class: every bin but the class's last holds exactly k docs,
    // hence is > C·k/(k+1) >= C/2 full (the harmonic bound)
    out.groupBy(_._5).foreach { case (k, rows) =>
      val byBin = rows.groupBy(_._1)
      val lastBin = byBin.keys.max
      byBin.foreach { case (bin, docsIn) =>
        if (bin != lastBin) {
          assert(docsIn.length == k, s"class $k bin $bin not full")
          assert(docsIn.map(_._4).sum * 2 > C,
            s"class $k bin $bin below half fill")
        }
      }
    }
    // dense global bin ids
    val bins = out.map(_._1).distinct.sorted
    assert(bins.toSeq == (0L until bins.length).toSeq)
    val again = Layout.packBins(docs, "doc_id", "n_tokens", C)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
  }
}
