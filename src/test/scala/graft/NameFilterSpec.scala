package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `SPARK_GRAFT_ONLY` dev filter (Bench/Verify) matches exact query
  * names; a trailing `*` is the explicit opt-in for a prefix family —
  * so `q11` can never silently select q110-q118.
  */
class NameFilterSpec extends AnyFunSuite {
  test("patterns match exact names only") {
    assert(GraftSession.nameSelected("q11_left_join", Set("q11_left_join")))
    assert(!GraftSession.nameSelected("q110_streaming_ingest", Set("q11")))
    assert(!GraftSession.nameSelected("q11_left_join", Set("q11")))
    assert(GraftSession.nameSelected("q2_x", Set("q1_y", "q2_x")))
  }

  test("trailing * opts into prefix matching") {
    assert(GraftSession.nameSelected("q110_streaming_ingest", Set("q11*")))
    assert(GraftSession.nameSelected("q11_left_join", Set("q11*")))
    assert(GraftSession.nameSelected("q119_pq_index_append", Set("q119*")))
    assert(!GraftSession.nameSelected("q12_anti_join", Set("q11*")))
  }
}
