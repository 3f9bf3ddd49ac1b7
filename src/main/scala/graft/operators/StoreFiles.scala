package graft.operators

import org.apache.spark.sql.SparkSession

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
}
