package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for heavy keys at cluster scale. AQE's skew
  * handling (`spark.sql.adaptive.skewJoin`, on by default in
  * [[graft.GraftSession]]) covers sort-merge joins at runtime; these cover
  * the two shapes AQE does not: skewed AGGREGATIONS, and skewed
  * shuffle-hash joins against a medium (non-broadcastable) build side.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt) first — spreading
    * a hot key over `salts` reducers — then combine the partials. The agg
    * expressions must be decomposable (sum/count/min/max; for avg pass
    * sum+count and divide after).
    *
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 16,
    *   partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
    *   combine = Seq(sum($"s").as("s"), sum($"c").as("c")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Seq[Column], combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(combine.head, combine.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a medium right side:
    * left rows get a random salt in [0, salts); the right side is
    * replicated `salts` times with every salt value, and the join key
    * becomes (key, salt). Hot left keys spread over `salts` tasks at the
    * cost of replicating the right side — use when the right side is too
    * big to broadcast but small enough to replicate.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched right row once PER SALT
    // (the right side is replicated) — only shapes where unmatched right
    // rows are dropped are sound
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Hot/cold split join for a skewed STREAM side against a keyed dim
    * whose hot head is tiny: dim rows matching `isHot` broadcast (their
    * stream rows never enter an exchange), the cold tail goes through the
    * normal shuffled equi-join — with the stream side pre-filtered by a
    * broadcast ANTI join on the hot keys, so hot-key rows are absent from
    * the cold exchange entirely (filtering at the probe would still have
    * shuffled them to one reducer first, keeping the skew).
    *
    * The classic Zipf shape: a token/term-frequency dim where the top
    * ~10⁴ keys cover most of the stream. Requires `isHot` to be constant
    * per key (e.g. a predicate on a per-key aggregate) — a key with dim
    * rows on BOTH sides of the split would lose its cold matches to the
    * anti join. Inner join semantics; result ≡ `stream.join(dim, key)`
    * up to row order. The stream plan is referenced twice (hot + cold
    * branch) — at scale that is a re-scan of a pruned columnar read,
    * cheap against a hot-key exchange; shuffle subplans feeding `dim`
    * are reused by Spark's exchange reuse.
    */
  def hotColdJoin(stream: DataFrame, dim: DataFrame, key: String,
      isHot: Column, assertConstantHot: Boolean = false): DataFrame = {
    val hotP = coalesce(isHot, lit(false))
    val hot = dim.filter(hotP)
    val cold = dim.filter(!hotP)
    if (assertConstantHot) {
      // opt-in guard for NEW call sites: a key with dim rows on both
      // sides of the split would silently lose its cold matches to the
      // anti join below — pay one small driver job here to fail loudly
      // instead (off by default; the check scans the dim twice)
      val straddle = hot.select(col(key)).intersect(cold.select(col(key)))
        .limit(1).count()
      require(straddle == 0,
        s"hotColdJoin: isHot is not constant per '$key' — at least one " +
          "key has dim rows on both sides of the hot/cold split; its " +
          "cold matches would be dropped")
    }
    val hotBranch = stream.join(broadcast(hot), Seq(key))
    // the anti join deliberately broadcasts the SAME full hot frame as
    // the hot branch (not a keys-only projection): identical broadcast
    // exchanges unify under Spark's exchange reuse, so the hot head is
    // built and shipped once for both joins
    val coldBranch = stream
      .join(broadcast(hot), Seq(key), "left_anti")
      .join(cold, Seq(key))
    hotBranch.unionByName(coldBranch)
  }

  /** Top skewed keys by frequency — the diagnosis step before salting
    * (returns keys whose row count exceeds `threshold`).
    */
  def skewedKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") > threshold)
}
