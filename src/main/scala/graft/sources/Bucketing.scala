package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffling a fact table once at write time
  * buys every subsequent equi-join/aggregation on the bucket key a
  * shuffle-free plan — at 100 TB the difference between re-shuffling
  * 100 TB per query and reading co-located buckets.
  *
  * Bucketing requires the session catalog (`saveAsTable`); bucket counts
  * should match downstream `spark.sql.shuffle.partitions` scale (and both
  * sides of a co-located join must share bucket count and key).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
