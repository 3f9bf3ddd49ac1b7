package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's one-line JSON out of a 2,000-char tail
  * window; overflow silently regresses to `parsed: null` (the r1/r2
  * failure mode). These specs pin the line's budget at a simulated
  * 140-query catalog — headroom past the current size — and its JSON
  * well-formedness, so catalog growth hits a test failure before it
  * hits the driver.
  */
class BenchRenderSpec extends AnyFunSuite {

  /** 140 rows shaped like the real catalog: keys q01..q140, a realistic
    * value spread (sub-second to double-digit seconds), a couple of
    * failures, and counter details feeding gc_sec/jobs.
    */
  private val simulated: Bench.Result = {
    val names = (1 to 140).map(i => f"q$i%02d_simulated_query_name")
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

  test("one-line JSON stays under 1,600 chars at 140 simulated rows") {
    val line = Bench.render(simulated, "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1600,
      s"bench line is ${line.length} chars — driver tail window is 2,000")
  }

  test("rendered line is parseable JSON with stripped numeric keys") {
    val line = Bench.render(simulated, "/root/testdata/sf0.1")
    // minimal structural checks without a JSON library: balanced braces,
    // the stripped-key form ("124":, never "q124":), failures as -1
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.contains("\"queries\":{"))
    assert(!line.contains("\"q1"), "keys must not keep the q prefix")
    assert(line.contains("\"14\":-1"), "failed q14 must appear as -1")
    assert(line.contains("\"failed\":[\"108\",\"14\",\"61\"]"))
    // per-query values are 1-decimal: no 2-decimal value inside queries{}
    val qs = line.substring(line.indexOf("\"queries\":{"))
    assert(!qs.substring(0, qs.indexOf("}")).matches(".*:\\d+\\.\\d{2}[,}].*"))
  }
}
