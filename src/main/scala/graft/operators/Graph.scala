package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — the rank/centrality
  * side of the graph story whose connectivity side is the incremental
  * connected components in [[Dedup]]. Extension surface: the reference
  * has no graph operators at all.
  *
  * Everything here is FIXED-POINT INTEGER arithmetic (the same
  * engine-exactness discipline as the BM25/PCA/NB literals): ranks are
  * integer shares of a scaled total mass, every division is an integer
  * `div` over non-negative values, so Spark and any mirror engine agree
  * bit-for-bit and the result is partitioning-invariant (integer sums
  * are exact and commutative — no IEEE reassociation drift).
  */
object Graph {

  /** Total scaled rank mass: ranks are "picos" of 1 (1e12 units). Large
    * enough that 6-8 iterations of floor division keep ~6 significant
    * digits on graphs up to ~1e9 nodes; small enough that
    * dampBp · mass = 8.5e15 stays far inside BIGINT.
    */
  val Scale: Long = 1000L * 1000 * 1000 * 1000

  /** PageRank by power iteration with floor arithmetic.
    *
    * Per iteration (damping in basis points, d = dampBp/10⁴):
    * {{{
    *   share(u)  = r(u) div outdeg(u)
    *   r'(v)     = ((10⁴−dampBp)·(S div N)) div 10⁴
    *             + (dampBp · Σ_{u→v} share(u)) div 10⁴
    * }}}
    * The floors are part of the OPERATOR SEMANTICS (documented
    * "PageRank with floor division") — a deliberate trade for exact
    * cross-engine reproducibility; the dropped fractional mass per node
    * per iteration is < 1 pico · (outdeg + 2). Dangling nodes (no
    * out-edges) simply evaporate their mass, the simplified power
    * iteration — pass bidirectional edges for a random-walk-on-
    * undirected-graph reading, which also guarantees no dangling nodes.
    *
    * Scale shape: each iteration is one equi-join of the edge relation
    * with the current rank relation (shuffle keyed on src) plus a keyed
    * aggregation on dst — the standard distributed PageRank step, no
    * driver state beyond the node COUNT (one scalar). Ranks are
    * `localCheckpoint`ed every iteration so the plan stays one-step
    * deep (the lineage of an iterative join chain otherwise grows
    * exponentially in the optimizer).
    *
    * @param edges  (srcCol, dstCol) LONG node ids; duplicate edges are
    *               collapsed (multi-edges would double-count shares)
    * @param iters  power iterations (6-8 reaches ~1e-3 relative
    *               stationarity on social-ish graphs)
    * @return (node, rank) — rank in [[Scale]] units, Σ rank ≤ Scale
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampBp: Int = 8500): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampBp >= 0 && dampBp <= 10000,
      s"dampBp must be in [0, 10000], got $dampBp")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // one scalar to the driver — the same bounded collect as the BM25
    // (N, T) stats row
    val n = nodes.count()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d")).localCheckpoint()
    val base = ((10000L - dampBp) * (Scale / n)) / 10000L
    var r = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rank div d")).as("contrib"))
      r = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"(${dampBp}L * coalesce(contrib, 0L)) div 10000L"))
            .as("rank"))
        .localCheckpoint()
    }
    r
  }
}
