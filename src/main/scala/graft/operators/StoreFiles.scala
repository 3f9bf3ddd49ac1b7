package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared file-store maintenance plumbing for the persisted index
  * families. Appends are NEW-FILES-ONLY by design (never rewrite a
  * committed file), so a nightly append loop accumulates small files
  * without bound; each family's `compact*Index` rewrites its bulk
  * subdirectory into target-sized files through the guarded temp-swap
  * below — the same idiom as [[Dedup.compactLabelStore]], generalized.
  */
private[graft] object StoreFiles {

  /** Rewrite one store subdirectory atomically-enough for a single
    * nightly writer: `write(tmp)` materializes the full replacement at
    * `<dir>_compact`, then the original is deleted and the replacement
    * renamed in. Hadoop's rename/delete signal most failures by
    * RETURNING FALSE, not throwing — an unchecked false after the
    * delete would silently destroy the store, so both are require'd;
    * on a failed rename the compacted data still sits in the temp dir
    * for manual recovery. NOT concurrent-safe with appends or probes
    * (single-nightly-writer contract, like every stored structure
    * here).
    */
  def swapIn(spark: SparkSession, dir: String)(write: String => Unit): Unit = {
    val tmp = s"${dir}_compact"
    write(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.delete(new org.apache.hadoop.fs.Path(dir), true),
      s"compact: could not delete $dir")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(dir)),
      s"compact: rename of $tmp failed — compacted data preserved " +
        s"there; restore manually")
  }

  /** Does a store subdirectory exist? Serve paths use this so stores
    * that have never seen a delete keep their exact pre-tombstone plan
    * (no extra relation, no counter drift).
    */
  def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Record deletes against an append-only store as TOMBSTONE rows —
    * the LSM delete: committed data files are never touched; `rows`
    * (already restricted by the caller to ids live in the store, and
    * distinct on `idCol`) lands as NEW files under the store's
    * tombstones subdirectory. Serve paths anti-join the tombstones;
    * the family's `compact*Index` applies them physically and
    * truncates the directory.
    *
    * Idempotent by construction: ids already tombstoned are dropped
    * here (anti join against the existing rows), so re-issuing a
    * delete — or deleting an id twice across batches — appends nothing
    * and never double-counts in any stats adjustment derived from the
    * tombstone relation. ONE append write, so a delete is as
    * crash-atomic as any other append.
    */
  def appendTombstones(spark: SparkSession, dir: String,
      rows: DataFrame, idCol: String): Unit = {
    val fresh =
      if (dirExists(spark, dir))
        rows.join(spark.read.parquet(dir).select(idCol), Seq(idCol),
          "left_anti")
      else rows
    fresh.write.mode("append").parquet(dir)
  }

  /** The tombstone relation, or None if the store has never seen a
    * delete.
    */
  def readTombstones(spark: SparkSession,
      dir: String): Option[DataFrame] =
    if (dirExists(spark, dir)) Some(spark.read.parquet(dir)) else None

  /** Drop a tombstones directory if present — `save*Index` paths call
    * this so a FRESH save never inherits deletes recorded against a
    * previous index that lived at the same path (the data subdirs are
    * mode("overwrite")-replaced; this is the missing overwrite for the
    * delete ledger).
    */
  def clearTombstones(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      require(fs.delete(p, true), s"clearTombstones: could not delete $dir")
  }
}
