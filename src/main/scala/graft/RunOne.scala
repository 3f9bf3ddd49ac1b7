package graft

/** Dev tool: run one catalog query with timing; optionally explain.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    var n = 0L
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[runone] $name run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
