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

  /** Top skewed keys by frequency — the diagnosis step before salting
    * (returns keys whose row count exceeds `threshold`).
    */
  def skewedKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") > threshold)
}
