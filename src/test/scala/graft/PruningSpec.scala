package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** MEASURED read-pruning for the stored ANN indexes — the read-side
  * twin of SkewSpec's measured shuffle bound: "probing nprobe of nlist
  * cells touches nprobe/nlist of the index files" as per-task
  * input-bytes arithmetic, not a comment.
  *
  * Why measured: the broadcast cell join ALONE plans a
  * DynamicPruningExpression but does not prune at runtime (under the
  * default reuseBroadcastOnly the probe side's exchange isn't
  * reusable here, so the fallback scans every cell — nprobe=1 and
  * nprobe=nlist read identical bytes; observed before the fix). The
  * serves therefore collect the probed cells (bounded: ≤ nlist
  * values — the bm25SearchIndex bucket-collect discipline) and filter
  * on the literal set, which prunes at plan time unconditionally.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_prune_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Total task input bytes during `action` — scoped listener, bus
    * drained before reading (the SkewSpec/Bench discipline).
    */
  private def totalInputBytes(action: => Unit): Long = {
    val sc = spark.sparkContext
    val tot = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { tot.addAndGet(m.inputMetrics.bytesRead); () }
      }
    }
    sc.addSparkListener(l)
    try { action; org.apache.spark.graft.ListenerBusDrain.drain(sc) }
    finally sc.removeSparkListener(l)
    tot.get()
  }

  test("ivfSearchIndex: input bytes scale with nprobe, and the probed " +
      "cells reach the scan as a STATIC partition filter") {
    val dir = tmpDir("ivf")
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(emb, "vec_id", "embedding"), dir)
    val idx = Similarity.loadIvfIndex(spark, dir)
    val q = emb.filter($"vec_id" === 0).localCheckpoint()
    def bytes(np: Int): Long = totalInputBytes {
      Similarity.ivfSearchIndex(q, idx, "vec_id", "embedding",
        k = 5, nprobe = np).count(); ()
    }
    val (b1, b4, bAll) = (bytes(1), bytes(4), bytes(16))
    // one probed cell must read a FRACTION of the all-cells scan (the
    // exact ratio is file-size dependent; 4x is a conservative floor
    // for a 16-cell index), and bytes must grow with nprobe
    assert(b1 * 4 <= bAll,
      s"nprobe=1 read $b1 bytes vs $bAll for all cells — scan not pruned")
    assert(b4 < bAll, s"nprobe=4 ($b4) did not read less than all ($bAll)")
    assert(b1 < b4, s"nprobe=1 ($b1) did not read less than nprobe=4 ($b4)")
    // the plan carries the literal cell set as a partition filter, and
    // no dynamic-pruning fallback remains
    val plan = Similarity.ivfSearchIndex(q, idx, "vec_id", "embedding",
      k = 5, nprobe = 1).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell partition filter missing on assignments scan:\n$plan")
    assert(!plan.contains("dynamicpruning"),
      "serve must not rely on dynamic partition pruning (it silently " +
        "falls back to a full scan when the broadcast is not reusable)")
  }

  test("pqSearchIndex: same measured pruning on the codes scan") {
    val dir = tmpDir("pq")
    Similarity.savePqIndex(
      Similarity.buildPqIndex(emb, "vec_id", "embedding"), dir)
    val idx = Similarity.loadPqIndex(spark, dir)
    val q = emb.filter($"vec_id" === 0).localCheckpoint()
    def bytes(np: Int): Long = totalInputBytes {
      Similarity.pqSearchIndex(q, idx, "vec_id", "embedding",
        k = 5, nprobe = np).count(); ()
    }
    val (b1, bAll) = (bytes(1), bytes(16))
    assert(b1 * 4 <= bAll,
      s"nprobe=1 read $b1 bytes vs $bAll for all cells — scan not pruned")
    val plan = Similarity.pqSearchIndex(q, idx, "vec_id", "embedding",
      k = 5, nprobe = 1).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell partition filter missing on codes scan:\n$plan")
    assert(!plan.contains("dynamicpruning"))
  }
}
