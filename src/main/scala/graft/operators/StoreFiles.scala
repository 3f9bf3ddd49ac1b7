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

  // ------------------------------------------------------------------
  // Snapshot manifests — generation-numbered commit log for a stored
  // family's data subdirectories (the Iceberg/Delta commit idea reduced
  // to its minimum). A committed batch appends ONE manifest row-file of
  // (gen, path) rows listing its data files AFTER they land; the
  // manifest write IS the commit point. Snapshot readers take the union
  // of manifested paths (optionally only generations ≤ an as-of bound —
  // time travel), so a torn append (crashed writer: data files, no
  // manifest row) is invisible, and [[vacuumStore]] physically removes
  // such orphans. Shared by the postings and PQ families; any other
  // append-only store can adopt it unchanged.
  // ------------------------------------------------------------------

  /** Every parquet data file under `subdirs`, via the Hadoop FS API
    * (works on HDFS/object stores, not just local disk).
    */
  def listDataFiles(spark: SparkSession,
      subdirs: Seq[String]): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    subdirs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet")) buf += f.toString
        }
        buf.toSeq
      }
    }.toSet
  }

  /** One manifest generation: (gen, path) rows under `dir/manifest`.
    * `overwrite` resets the commit log (a fresh save, or a compaction
    * collapsing history to a new generation 0).
    */
  def writeManifest(spark: SparkSession, dir: String, gen: Long,
      paths: Set[String], mode: String): Unit = {
    import spark.implicits._
    paths.toSeq.sorted.map((gen, _)).toDF("gen", "path")
      .coalesce(1).write.mode(mode).parquet(s"$dir/manifest")
  }

  /** Latest committed generation, or -1 for a store with no manifest
    * (never committed, or pre-manifest layout).
    */
  def manifestGen(spark: SparkSession, dir: String): Long =
    if (!dirExists(spark, s"$dir/manifest")) -1L
    else spark.read.parquet(s"$dir/manifest")
      .agg(org.apache.spark.sql.functions.max("gen")).head().getLong(0)

  /** The committed file set: union of every manifest row with
    * gen ≤ `asOf` (defaults to all — the latest snapshot). Collected on
    * the driver (bounded: one row per data file, the same scale as any
    * file listing).
    */
  def manifestPaths(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): Seq[String] = {
    val m = spark.read.parquet(s"$dir/manifest")
    asOf.fold(m)(g =>
        m.filter(org.apache.spark.sql.functions.col("gen") <= g))
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** Run a family's append under the commit protocol: data files land
    * first (`append`), then the before/after listing diff — exactly the
    * batch's files under the single-writer contract — commits as one
    * manifest row-file at generation `manifestGen + 1`. With
    * `expectedGen` set, the commit is OPTIMISTIC: if another writer
    * committed since the caller read that generation, the manifest
    * write is refused and the batch's data files are left ORPHANED —
    * invisible to every snapshot reader, reclaimed by [[vacuumStore]]
    * or the next compaction — which is the standard OCC loser outcome
    * (redo the append against the new snapshot). Returns the committed
    * generation.
    */
  def commitAppend(spark: SparkSession, dir: String,
      dataDirs: Seq[String], expectedGen: Option[Long] = None)(
      append: => Unit): Long = {
    val before = listDataFiles(spark, dataDirs)
    append
    val cur = manifestGen(spark, dir)
    expectedGen.foreach { e =>
      if (cur != e)
        throw new IllegalStateException(
          s"commitAppend: store $dir is at generation $cur, expected $e — " +
            s"a concurrent commit won; this batch's data files are " +
            s"orphaned (vacuum reclaims them); re-read and retry")
    }
    writeManifest(spark, dir, cur + 1L,
      listDataFiles(spark, dataDirs) -- before, "append")
    cur + 1L
  }

  /** Physically delete data files NOT in the committed set — the
    * leftovers of torn appends and lost optimistic commits. Returns the
    * deleted paths. Single-nightly-writer contract: must not race an
    * in-flight append (whose files are legitimately unmanifested until
    * its commit point).
    */
  def vacuumStore(spark: SparkSession, dir: String,
      dataDirs: Seq[String]): Seq[String] = {
    require(dirExists(spark, s"$dir/manifest"),
      s"vacuumStore: $dir has no manifest — nothing defines the " +
        s"committed set")
    val committed = manifestPaths(spark, dir).toSet
    val orphans =
      (listDataFiles(spark, dataDirs) -- committed).toSeq.sorted
    val conf = spark.sparkContext.hadoopConfiguration
    orphans.foreach { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      require(p.getFileSystem(conf).delete(p, false),
        s"vacuumStore: could not delete orphan $s")
    }
    orphans
  }
}
