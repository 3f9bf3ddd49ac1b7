package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entrypoint (tests, Bench, Verify,
  * pipeline drivers) runs with the same scale-aware configuration.
  *
  * Tuned for the driver's local[32] harness but written for a real cluster:
  * AQE handles runtime re-planning (skew joins, shuffle coalescing), shuffle
  * partitions default to the local core count instead of 200, and parquet
  * nanosecond timestamps (the `events` table) are read as longs that
  * [[Tables]] converts explicitly.
  */
object GraftSession {
  def builder(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** `SPARK_GRAFT_ONLY` matcher shared by Bench and Verify: a pattern
    * selects a query by EXACT name, or by prefix when it carries an
    * explicit trailing `*` — so `q11` selects only q11, not q110-q118;
    * `q11*` opts into the prefix family deliberately.
    */
  def nameSelected(name: String, patterns: Set[String]): Boolean =
    patterns.exists { p =>
      if (p.endsWith("*")) name.startsWith(p.dropRight(1)) else name == p
    }

  /** Apply graft configs to an externally-created builder (Bench/Verify). */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
