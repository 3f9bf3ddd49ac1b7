package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's one-line JSON out of a 2,000-char tail
  * window; overflow silently regresses to `parsed: null` (the r1/r2
  * failure mode, nearly re-hit at 185 rows with the map-of-all-queries
  * form). These specs pin the line's budget at a simulated 320-query
  * catalog — far past the current size — and the positional-list
  * contract (`"qds"` in sorted-full-name order, `"n"` as zip check),
  * so catalog growth hits a test failure before it hits the driver.
  */
class BenchRenderSpec extends AnyFunSuite {

  /** 320 rows shaped like the real catalog: keys q01..q320, a realistic
    * value spread (sub-second to double-digit seconds), a couple of
    * failures, and counter details feeding gc_sec/jobs.
    */
  private val simulated: Bench.Result = {
    val names = (1 to 320).map(i => f"q$i%02d_simulated_query_name")
    val times = names.zipWithIndex.collect {
      case (n, i) if i % 47 != 13 =>
        n -> (if (i % 9 == 0) 10.0 + i * 0.37 else 0.01 + i * 0.013)
    }.toMap
    val failed = names.zipWithIndex.collect { case (n, i) if i % 47 == 13 => n }
    val details = times.map { case (n, _) =>
      n -> Bench.Stats(137, 137, 1708, 2500000L, 2500000L, 7000L, 0L)
    }
    Bench.Result(times, failed, details,
      calibCpuSec = 0.091, calibShuffleSec = 0.346)
  }

  test("one-line JSON stays under 1,500 chars at 320 simulated rows") {
    val line = Bench.render(simulated, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1500,
      s"bench line is ${line.length} chars — driver tail window is 2,000")
  }

  test("rendered line is parseable JSON with the positional qds list") {
    val line = Bench.render(simulated, "/root/testdata/sf0.1")
    // minimal structural checks without a JSON library: balanced braces,
    // the stripped-key form ("124":, never "q124":), failures as -1
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.contains("\"queries\":{"))
    assert(!line.contains("\"q1"), "keys must not keep the q prefix")
    assert(line.contains("\"n\":320"))
    assert(line.contains("\"sf\":\"sf0.1\""), "sf must be the basename")
    // qds: one entry per catalog row, sorted-full-name order; failed = -1
    val qds = line.substring(line.indexOf("\"qds\":\"") + 7)
    val vals = qds.substring(0, qds.indexOf('"')).split(",")
    assert(vals.length == 320)
    val sortedNames = ((1 to 320).map(i => f"q$i%02d_simulated_query_name")).sorted
    val failedIdx = sortedNames.zipWithIndex.collect {
      case (n, i) if simulated.failed.contains(n) => i
    }
    failedIdx.foreach(i => assert(vals(i) == "-1", s"pos $i must be -1"))
    // spot-check a deciseconds value against the source map
    val probe = sortedNames.indexWhere(n => simulated.times.contains(n))
    assert(vals(probe).toLong ==
      math.round(simulated.times(sortedNames(probe)) * 10))
  }

  test("queries map keeps the slowest rows and every failure as -1") {
    val line = Bench.render(simulated, "/root/testdata/sf0.1")
    val qs = line.substring(line.indexOf("\"queries\":{"))
    val body = qs.substring(0, qs.indexOf("}"))
    // the global slowest query must be in the map
    val slowest = simulated.times.maxBy(_._2)._1
    val slowKey = slowest.takeWhile(_ != '_').stripPrefix("q")
    assert(body.contains(s"\"$slowKey\":"))
    // each failed query appears as -1
    simulated.failed.foreach { f =>
      val k = f.takeWhile(_ != '_').stripPrefix("q")
      assert(body.contains(s"\"$k\":-1"), s"failed $f must appear as -1")
    }
  }
}
