package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys and
  * layout-aware writes. At 100 TB the scan is the dominant cost, and a
  * multi-column skipping layout is how a lakehouse table stays prunable
  * on more than one predicate column: sorting files by the interleaved
  * key gives every file a tight min/max envelope on BOTH dimensions, so
  * parquet row-group / file skipping works for either predicate.
  */
object Layout {

  /** Morton interleave of two non-negative integer columns, each below
    * 2^bits: bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    * integer bit arithmetic (shifts + masks), codegen-friendly, and
    * exactly reproducible in any engine — no library calls.
    */
  def zOrder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i)
    }
    val ys = (0 until bits).map { i =>
      shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }
    (xs ++ ys).reduce(_ + _)
  }

  /** Write `df` clustered by the z-value of (x, y): range-partition on
    * the z key (contiguous z ranges per output file), sort within each
    * partition, drop the helper column, write parquet. numFiles controls
    * the file count — at scale, size it so each file is ~128-512 MB.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zOrder2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** RENDEZVOUS (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998 — the consistent-placement scheme behind cache
    * rings and shard maps): a key's shard is the argmax over shards of
    * an (key, shard) hash. The property that matters at 100 TB: growing
    * N → N+1 shards moves EXACTLY the keys whose new shard wins the
    * argmax — an expected 1/(N+1) of the data — while a mod-N
    * assignment reshuffles (N−1)/N of everything. Fully deterministic
    * (md5, the [[Curation.md5Bucket]] discipline): any engine, any
    * partitioning, same map.
    *
    * Plan shape: one bounded explode (×nShards) and one per-key argmax
    * window — scan-linear, shuffled on the key once. For the pure
    * column form at fixed small N an unrolled greatest-of expression
    * would avoid even that shuffle; the relational form keeps N a
    * runtime parameter.
    *
    * @return (idCol, shard) — shard ∈ [0, nShards)
    */
  def rendezvousShards(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__hrw").desc, col("shard").asc)
    df.select(col(idCol)).distinct()
      .select(col(idCol),
        explode(sequence(lit(0), lit(nShards - 1))).as("shard"))
      .withColumn("__hrw",
        conv(substring(md5(concat(lit("rv:"), col(idCol).cast("string"),
          lit(":"), col("shard").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("shard"))
  }
}
