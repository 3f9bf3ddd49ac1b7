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
}
