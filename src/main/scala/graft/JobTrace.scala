package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: run one catalog query with a per-JOB trace — id, wall
  * millis, and the call site that scheduled it — so a many-job
  * lifecycle row's cost can be attributed line-by-line (Bench's
  * counters say HOW MANY jobs; this says WHICH code paid for them).
  * Usage: runMain graft.JobTrace <queryName> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        val site = p.flatMap(x => Option(x.getProperty("callSite.short")))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.job.description"))))
          .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
          .takeWhile(_ != '\n').take(110)
        starts.put(j.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null)
          System.err.println(f"[jobtrace] job=${e.jobId}%-4d ${(System.nanoTime() - s._1) / 1e6}%8.1f ms  ${s._2}")
      }
    })
    // warmup once (codegen/JIT/footer caches), then one traced run
    try { SparkEntry.queries(name)(spark, sfDir).count(); () }
    catch { case t: Throwable => System.err.println(s"[jobtrace] warmup failed: $t") }
    spark.catalog.clearCache()
    System.err.println(s"[jobtrace] === timed run of $name ===")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    System.err.println(f"[jobtrace] $name rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
