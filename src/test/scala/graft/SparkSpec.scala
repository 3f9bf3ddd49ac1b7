package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared single session for all suites (local[4] keeps test JVMs light). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder(cpus = "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  def sf: String = TestSession.sf

  /** (path → mtime) of every parquet data file under `dirs` — the shared
    * probe for "append never rewrites existing files" contracts (IVF and
    * band-index append specs).
    */
  def parquetStamps(dirs: String*): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    dirs.flatMap(d => walk(new java.io.File(d)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }
}
