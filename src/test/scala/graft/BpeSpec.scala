package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge-table training: hand-checked merges on the classic
  * low/lower/lowest-style fixture, the non-overlapping merge
  * convention, determinism, and the ROUNDTRIP contract — applying the
  * learned table (the k nested replaces the oracle also runs)
  * reproduces the training loop's final segmentation exactly.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies (via repetition): low×5, lower×2, newest×6,
  // widest×3 — the Sennrich worked example's shape
  private val docs = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest"
  ).toDF("text")

  test("training learns the hand-computed merge sequence") {
    val merges = Bpe.train(docs, "text", nMerges = 4)
    // pair counts, round 1: (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7,
    // (w,e) 8, (n,e) 6, (e,w) 6 … tie (e,s)/(s,t) 9 breaks on a asc →
    // (e,s); then (es,t) 9; then (w,es t)? no — recount: (l,o) 7,
    // (o,w) 7, (w,est) 8 wait — after (es,t): newest = n e w est,
    // widest = w i d est, so (w,est) 6+0 … verify the invariants
    // rather than a fragile full-by-hand chain: first merge is (e,s),
    // second (es,t) — the textbook start
    assert(merges(0).a == "e" && merges(0).b == "s")
    assert(merges(1).a == "es" && merges(1).b == "t")
    assert(merges.length == 4)
    // determinism: retraining yields the identical table
    assert(Bpe.train(docs, "text", nMerges = 4) == merges)
  }

  test("driver trainers agree three ways: indexed ≡ recount ≡ classic") {
    // the q243 oracle rests on indexed ≡ recount; this pins all three
    // driver loops (incl. the original per-merge-scan one) to the same
    // (merges, rounds) on a fixture with real tie-breaks and conflicts
    val vocab = Bpe.collectVocab(Bpe.initialVocab(docs, "text"))
    val a = Bpe.trainDriverIndexed(vocab, nMerges = 40, batchSize = 4,
      minCount = 1L, overfetch = 4)
    val b = Bpe.trainDriverRecount(vocab, nMerges = 40, batchSize = 4,
      minCount = 1L, overfetch = 4)
    val c = Bpe.trainDriver(vocab, nMerges = 40, batchSize = 4,
      minCount = 1L, overfetch = 4)
    assert(a == b, s"indexed vs recount:\n$a\n$b")
    assert(b == c, s"recount vs classic:\n$b\n$c")
    // and on a hash-diverse vocabulary (the q243 shape, small slice)
    val synth = Bpe.collectVocab(Bpe.initialVocab(
      spark.range(0, 512).select(
        substring(md5(concat(lit("bpe:"), col("id").cast("string"))),
          1, 16).as("w")), "w"))
    val sa = Bpe.trainDriverIndexed(synth, nMerges = 600, batchSize = 64,
      minCount = 1L, overfetch = 8)
    val sb = Bpe.trainDriverRecount(synth, nMerges = 600, batchSize = 64,
      minCount = 1L, overfetch = 8)
    val sc = Bpe.trainDriver(synth, nMerges = 600, batchSize = 64,
      minCount = 1L, overfetch = 8)
    assert(sa == sb && sb == sc)
  }

  test("merge application is leftmost non-overlapping (aaa → aa|a)") {
    val d = Seq("aaa aaaa").toDF("text")
    val merges = Seq(Bpe.Merge(0, "a", "a"))
    val got = Bpe.segmentVocab(d, "text", merges)
      .select(col("word"), col("n_subwords"))
      .as[(String, Long)].collect().toMap
    // aaa: (aa)(a) = 2 subwords; aaaa: (aa)(aa) = 2
    assert(got("aaa") == 2L)
    assert(got("aaaa") == 2L)
  }

  test("boundary alignment: a merge never fires inside a longer symbol") {
    // learn nothing; apply a hand-built (a,b) merge to words where the
    // pair only appears as a SUFFIX/PREFIX of other symbols after a
    // first merge — xa|b must not merge via (a,b)
    val d = Seq("xab xab ab ab ab").toDF("text")
    val merges = Seq(Bpe.Merge(0, "x", "a"), Bpe.Merge(1, "a", "b"))
    val got = Bpe.segmentVocab(d, "text", merges)
      .select(col("word"), col("seg"), col("n_subwords"))
      .as[(String, String, Long)].collect()
      .map { case (w, s, n) => (w, (s, n)) }.toMap
    // xab: (x,a) fires first → xa|b; then (a,b) must NOT match inside
    // "xa"+"b" (the 'a' is not a whole symbol) → stays 2 subwords
    assert(got("xab")._2 == 2L)
    // ab: (a,b) fires → 1 subword
    assert(got("ab")._2 == 1L)
  }

  test("roundtrip: applying the learned table reproduces the training segmentation") {
    val merges = Bpe.train(docs, "text", nMerges = 5)
    // rebuild the training loop's final state by explicit rounds
    var vocab = Bpe.initialVocab(docs, "text")
    merges.foreach { m =>
      vocab = vocab.withColumn("seg", Bpe.applyMerge(col("seg"), m.a, m.b))
    }
    val trained = vocab.select(col("word"), col("seg"))
      .as[(String, String)].collect().toMap
    val applied = Bpe.segmentVocab(docs, "text", merges)
      .select(col("word"), col("seg"))
      .as[(String, String)].collect().toMap
    assert(applied == trained)
  }

  test("corpus segmentation sums vocab subword counts per document") {
    val d = Seq((1L, "ab ab xy"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(0, "a", "b"))
    val got = Bpe.segmentCorpus(d, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => (id, (w, s)) }.toMap
    assert(got(1L) == ((3L, 4L))) // ab=1, ab=1, xy=2
    assert(got(2L) == ((1L, 1L)))
  }

  test("early stop: minCount prunes pairs below the threshold") {
    val d = Seq("ab cd").toDF("text") // every pair count = 1
    assert(Bpe.train(d, "text", nMerges = 3, minCount = 2).isEmpty)
  }

  test("trainBatched: batchSize=1 ≡ classic training; a batch never " +
      "accepts conflicting pairs; roundtrip holds for the batched table") {
    assert(Bpe.trainBatched(docs, "text", nMerges = 6, batchSize = 1) ==
      Bpe.train(docs, "text", nMerges = 6))
    val batched = Bpe.trainBatched(docs, "text", nMerges = 6, batchSize = 3)
    assert(batched.size == 6)
    assert(batched.map(_.rank) == (0 until 6))
    // bit-deterministic: the bounded ranked collect + greedy filter
    // has no nondeterministic step
    assert(Bpe.trainBatched(docs, "text", nMerges = 6, batchSize = 3)
      == batched)
    // the batched table is a valid tokenizer: applying it reproduces
    // the training loop's own final segmentation (same fold, so this
    // pins that the stored ranks replay in acceptance order)
    val segApplied = Bpe.segmentVocab(docs, "text", batched)
      .select($"word", $"seg").as[(String, String)].collect().toMap
    val segDirect = batched.foldLeft(Bpe.initialVocab(docs, "text")) {
      (v, m) => v.withColumn("seg", Bpe.applyMerge($"seg", m.a, m.b))
    }.select($"word", $"seg").as[(String, String)].collect().toMap
    assert(segApplied == segDirect)
    // and it genuinely compresses: total subwords strictly below the
    // character count
    val n = Bpe.segmentVocab(docs, "text", batched)
      .agg(sum($"n_subwords" * $"freq")).as[Long].head()
    val chars = Bpe.segmentVocab(docs, "text", Seq.empty)
      .agg(sum($"n_subwords" * $"freq")).as[Long].head()
    assert(n < chars)
  }

  test("driver path ≡ distributed path, classic and batched (merge " +
      "tables and round counts bit-identical)") {
    // the fixture rides the driver path by default; budget 0 forces
    // the distributed loop — both must learn the same table
    assert(Bpe.train(docs, "text", nMerges = 8) ==
      Bpe.train(docs, "text", nMerges = 8, driverVocabBudget = 0L))
    assert(Bpe.trainBatchedCounted(docs, "text", nMerges = 10,
        batchSize = 3, overfetch = 8) ==
      Bpe.trainBatchedCounted(docs, "text", nMerges = 10, batchSize = 3,
        overfetch = 8, driverVocabBudget = 0L))
    // and on real data with minCount=1 (the q234 trainer contract)
    val real = Tables(spark, sf, "documents")
    assert(Bpe.trainBatchedCounted(real, "text", nMerges = 40,
        batchSize = 8, minCount = 1) ==
      Bpe.trainBatchedCounted(real, "text", nMerges = 40, batchSize = 8,
        minCount = 1, driverVocabBudget = 0L))
    // ...and on the ID-like corpus where the incrementally-maintained
    // pair-count relation churns hardest (shared digit symbols: every
    // round's batch destroys and creates many counts): 120 merges of
    // delta maintenance must equal the driver's full recounts exactly
    val cust = Tables(spark, sf, "customer")
    assert(Bpe.trainBatchedCounted(cust, "c_name", nMerges = 120,
        batchSize = 16, minCount = 1, overfetch = 16) ==
      Bpe.trainBatchedCounted(cust, "c_name", nMerges = 120, batchSize = 16,
        minCount = 1, overfetch = 16, driverVocabBudget = 0L))
  }

  test("encodeCorpusIds: hand-checked ids and order-sensitive checksum") {
    // no merges ⇒ character tokenizer; distinct chars of "ab ba b" are
    // {a, b} ⇒ ids a=0, b=1 (UTF-8 order). Doc "ab ba b" id stream:
    // a b b a b = 0 1 1 0 1 at pos 0..4
    val d = Seq((7L, "ab ba b")).toDF("doc_id", "text")
    val out = Bpe.encodeCorpusIds(d, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long, Long)].collect().toSet
    // n=5, sum=3, possum = 2*1 + 3*1 + 5*1 = 10 (1-based pos weights)
    assert(out == Set((7L, 5L, 3L, 10L)))
    // order sensitivity: "ba ab b" has the same id multiset but stream
    // b a a b b = 1 0 0 1 1 → possum = 1 + 4 + 5 = 10 — pick a fixture
    // where it differs: "b ab ba" → b a b b a = 1 0 1 1 0 → 1+3+4 = 8
    val d2 = Seq((7L, "b ab ba")).toDF("doc_id", "text")
    val out2 = Bpe.encodeCorpusIds(d2, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out2 == Set((7L, 5L, 3L, 8L)))
    // under a merge, the merged symbol re-ranks the vocabulary: merge
    // (b,a) on "ab ba b" → segs: a|b, ba, b → vocab {a, b, ba} ids
    // a=0, b=1, ba=2; stream a b ba b = 0 1 2 1 → n=4 sum=4
    // possum = 2*1 + 3*2 + 4*1 = 12
    val m = Seq(Bpe.Merge(0, "b", "a"))
    val out3 = Bpe.encodeCorpusIds(d, "doc_id", "text", m)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out3 == Set((7L, 4L, 4L, 12L)))
  }
}
