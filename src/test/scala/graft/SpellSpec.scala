package graft

import graft.operators.Spell

/** Symmetric-delete spelling correction: neighborhood recall at
  * distance ≤ 1, distance-2 rejection, frequency ranking, short-term
  * gate. */
class SpellSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq(("hello", 100L), ("help", 50L), ("hells", 10L),
    ("world", 80L), ("wxyz", 5L)).toDF("term", "freq")

  test("corrections: insert/substitute matches found, ranked by frequency; ED-2 rejected") {
    val qs = Seq("helo", "word", "hello", "zzzz").toDF("q")
    val got = Spell.corrections(dict, "term", "freq", qs, "q",
        topK = 3, minLen = 4)
      .as[(String, String, Long, Int, Int)].collect().toSet
    assert(got == Set(
      // substitution AND insertion neighbors, most-frequent first
      ("helo", "hello", 100L, 1, 1), ("helo", "help", 50L, 1, 2),
      // "word" is a delete of "world"
      ("word", "world", 80L, 1, 1),
      // exact match outranks the distance-1 "hells" (shared key "hell")
      ("hello", "hello", 100L, 0, 1), ("hello", "hells", 10L, 1, 2)),
      s"got $got")
  }

  test("corrections: short queries and short dictionary terms are gated out") {
    val d = dict.union(Seq(("cat", 999L)).toDF("term", "freq"))
    val got = Spell.corrections(d, "term", "freq",
        Seq("cat", "cap", "helo").toDF("q"), "q", topK = 3, minLen = 4)
      .as[(String, String, Long, Int, Int)].collect()
    // neither "cat" (dict) nor "cap"/"cat" (queries) survive minLen = 4
    assert(got.forall(r => r._1 == "helo"), s"got ${got.toList}")
  }
}
