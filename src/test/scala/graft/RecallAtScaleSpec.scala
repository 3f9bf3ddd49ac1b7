package graft

import graft.operators.Similarity

/** MEASURED ANN recall at sf0.1 — the r10 verdict's item 8: recall@10
  * was pinned at sf0.01 (q134 multi-probe 0.955, q121 refine
  * 0.295→0.655); these assertions extend the measurement to the bench
  * scale so a probe/bucketing regression that only shows at larger
  * corpora (more cells populated, denser buckets) fails a test, not a
  * bench review. Corpus 2000 × 64-dim at sf0.1, 80 queries — brute
  * force ground truth stays cheap, so every approximate family is
  * measured against it directly. Config-gated (assume) on the sf0.1
  * fixture being present, like PostgresIntegrationSpec.
  */
class RecallAtScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.1"
  private def available = new java.io.File(s"$sf01/embeddings.parquet").exists()

  private lazy val emb = Tables(spark, sf01, "embeddings")
  private lazy val queries = emb.filter($"vec_id" % 25 === 0)
  private lazy val brute = Similarity
    .bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
    .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

  private def recallOf(pairs: Set[(Long, Long)]): Double =
    (brute & pairs).size.toDouble / brute.size

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet

  test("sf0.1 recall@10: IVF routing, PQ/SQ8 coding, exact refine, " +
      "multi-probe LSH all hold their documented floors at bench scale") {
    assume(available, s"sf0.1 fixture not present at $sf01")
    val ivf = recallOf(pairsOf(
      Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10)))
    val pq = recallOf(pairsOf(
      Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", 10)))
    val sq8 = recallOf(pairsOf(
      Similarity.ivfSq8TopK(queries, emb, "vec_id", "embedding", 10)))
    val idx = Similarity.buildPqIndex(emb, "vec_id", "embedding")
    val raw = recallOf(pairsOf(
      Similarity.pqSearchIndex(queries, idx, "vec_id", "embedding", 10)))
    val refined = recallOf(pairsOf(
      Similarity.pqSearchRefined(queries, idx, emb, "vec_id", "embedding", 10)))
    val lsh = recallOf(pairsOf(
      Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10)))
    val multi = recallOf(pairsOf(
      Similarity.lshTopKMultiProbe(queries, emb, "vec_id", "embedding", 10)))
    info(f"sf0.1 recall@10: ivf=$ivf%.3f pq=$pq%.3f sq8=$sq8%.3f " +
      f"pqRaw=$raw%.3f pqRefined=$refined%.3f lsh=$lsh%.3f multi=$multi%.3f")
    // ordering invariants — these are the claims the operators make:
    // one byte/dim (SQ8) retains more signal than one code/8 dims (PQ),
    // exact refine recovers coding loss, multi-probe beats single-probe
    assert(sq8 >= pq - 0.02, s"SQ8 $sq8 fell below PQ $pq")
    assert(refined > raw, s"refine did not improve: raw=$raw refined=$refined")
    assert(multi >= lsh, s"multi-probe $multi below single-probe $lsh")
    // absolute floors, set just under the measured sf0.1 values so a
    // real probe/bucketing regression trips them. Pinned measurement
    // (2000 × 64-dim, 80 queries, default params): ivf=0.534 pq=0.150
    // sq8=0.534 pqRaw=0.150 pqRefined=0.360 lsh=0.539 multi=0.979 —
    // fixed-parameter recall degrades as the corpus grows past the
    // probe budget (q121's 0.655 at sf0.01 → 0.360 here), which is
    // exactly the number an operator's own Scaladoc floor must not
    // overstate; SQ8 matching plain IVF (0.534) shows its byte coding
    // near-lossless at this dim count.
    assert(ivf > 0.45, s"IVF recall too low at sf0.1: $ivf")
    assert(pq > 0.12, s"IVF-PQ recall too low at sf0.1: $pq")
    assert(sq8 > 0.45, s"IVF-SQ8 recall too low at sf0.1: $sq8")
    // the DEFAULT SERVING PATH for stored PQ (pqSearchRefined — raw ADC
    // is the store-lifecycle proof, not the product path) must hold
    // >= 0.35 at bench scale (r12 measured 0.360)
    assert(refined >= 0.35,
      s"default PQ serve (refined) recall too low at sf0.1: $refined")
    assert(multi > 0.90, s"multi-probe recall too low at sf0.1: $multi")
  }

  test("auto-retrain fires on a drifted distribution and restores " +
      "coding fidelity (q245's policy, measured at bench scale)") {
    assume(available, s"sf0.1 fixture not present at $sf01")
    import org.apache.spark.sql.functions.{col, lit, transform}
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_retrain_recall").toString
    // seed index on the ORIGINAL distribution; the shifted copies are
    // the drifted ingest its codebooks were never trained for
    Similarity.savePqIndexCommitted(
      Similarity.buildPqIndex(emb, "vec_id", "embedding"), dir)
    Similarity.recordPqBaseline(spark, dir, emb, "vec_id", "embedding")
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.0)).as("embedding"))
    val shifted = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => x * lit(4.0)).as("embedding"))
    val full = base.unionByName(shifted)
    Similarity.appendPqIndexCommitted(spark, dir, shifted,
      "vec_id", "embedding")
    val sq = shifted.filter(col("vec_id") % 25 === 0)
    // ground truth for the SHIFTED queries over the full mixture.
    // Measured through the REFINED serve (ADC shortlist + exact
    // rerank): its recall is exactly shortlist quality, which is what
    // the codebooks control — raw ADC@10 at these params is noise on
    // both sides of the retrain, while the shortlist either contains
    // the true neighbors (fresh codebooks) or misses them (stale).
    val truth = Similarity
      .bruteForceTopK(sq, full, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallNow(): Double = {
      val got = pairsOf(Similarity.pqSearchRefined(sq,
        Similarity.loadPqIndexSnapshot(spark, dir), full,
        "vec_id", "embedding", 10))
      (truth & got).size.toDouble / truth.size
    }
    def codingErr(): Long = Similarity.pqCodingError(spark, dir, shifted,
      "vec_id", "embedding").head().getAs[Long]("mean_dist2")
    val (before, errBefore) = (recallNow(), codingErr())
    assert(Similarity.maintainPqCodebooks(spark, dir, shifted, full,
      "vec_id", "embedding", Similarity.RetrainPolicy(maxRatioPct = 250)),
      "the shifted batch must fire the retrain")
    val (after, errAfter) = (recallNow(), codingErr())
    info(f"shifted-query refined recall@10: before=$before%.3f " +
      f"after=$after%.3f; mean coding dist2: $errBefore -> $errAfter")
    // What the measurement actually shows (and the assertions pin):
    // the policy's objective — coding FIDELITY on the drifted batch —
    // strictly improves, and the refined serve stays functional on
    // both sides of the retrain. Recall itself is NOT asserted to
    // rise, because measured behavior is the opposite for a scale
    // drift: systematic coding bias CANCELS between a query and a
    // corpus coded with the same stale codebooks (relative ADC
    // ordering within the scaled population partially survives —
    // 0.388 before), while retraining on the scale-MIXED corpus
    // dilutes the fixed code budget across two shells (0.250 after).
    // The honest operational lesson a 100 TB deployment needs:
    // retrain serves reconstruction-style consumers immediately;
    // ranking-only consumers on a scale-split corpus want per-shard
    // indexes, not one diluted codebook.
    assert(errAfter < errBefore,
      s"retrain must reduce the shifted batch's coding error: " +
        s"$errBefore -> $errAfter")
    assert(before > 0.2 && after > 0.2,
      s"the refined serve must stay functional across the retrain " +
        s"lifecycle: before=$before after=$after")
  }
}
