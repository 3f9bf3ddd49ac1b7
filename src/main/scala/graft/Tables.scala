package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's predicate pushdown and
  * column pruning reach the file source — callers should `.select`/`.filter`
  * on the returned frame rather than materialize it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // runtime-settable: lets events load even from sessions that were
      // not built through GraftSession (e.g. a driver-owned session)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** The `events` table stores `ts` as parquet TIMESTAMP(NANOS) which Spark
    * reads as a nanosecond long (spark.sql.legacy.parquet.nanosAsLong=true).
    * Convert to a proper TimestampType column (microsecond precision).
    */
  private def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        // integer division: epoch-nanos (~1.7e18) exceeds double's exact
        // integer range, so `/ 1000` via double would drift by microseconds
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) files surface as NTZ;
        // consumers (unix_micros, watermarks) expect session-TZ
        // TimestampType — the session runs UTC, so the cast is
        // value-preserving
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  // last directory registered per session: repeat registrations of the
  // same dir are no-ops (each one re-lists 10 parquet footers otherwise);
  // a dir CHANGE re-registers so views never point at stale data.
  // WEAK-keyed: a strong session-keyed map would reference every session
  // ever passed in (including stopped ones) for the JVM lifetime. Access
  // only under the registerAll lock.
  private val lastRegistered =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table for `spark.sql` use (idempotent per dir).
    * Synchronized, and the dir is recorded only AFTER all ten views
    * exist — a partial failure must not poison the session into
    * no-op-ing forever, and a concurrent caller must not proceed
    * against views that are not there yet.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (lastRegistered.get(spark) != dir) {
      names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
      lastRegistered.put(spark, dir)
    }
  }
}
