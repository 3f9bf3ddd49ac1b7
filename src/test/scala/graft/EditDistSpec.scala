package graft

import graft.operators.EditDist
import org.apache.spark.sql.functions._

/** Edit-distance near-dup: the q-gram count filter must be LOSSLESS —
  * identical pairs to the naive all-pairs form — across gram-path,
  * short-bucket, and mixed regimes, with no duplicate emissions.
  */
class EditDistSpec extends SparkSpec {
  import spark.implicits._

  /** Naive all-pairs reference (test-only crossJoin). */
  private def naive(df: org.apache.spark.sql.DataFrame,
      d: Int): Set[(Long, Long, Long)] =
    df.select($"id".as("id_a"), $"s".as("s_a"))
      .crossJoin(df.select($"id".as("id_b"), $"s".as("s_b")))
      .filter($"id_a" < $"id_b" &&
        levenshtein($"s_a", $"s_b") <= d)
      .select($"id_a", $"id_b", levenshtein($"s_a", $"s_b").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  test("hand fixture: substitutions, indels, shorts, repetitive strings, non-matches") {
    val df = Seq(
      1L -> "the quick brown fox",   // vs 2: one substitution
      2L -> "the quick crown fox",
      3L -> "the quick brown foxes", // vs 1: 2 inserts
      4L -> "ab",                    // bucket (no 3-grams at all)
      5L -> "abc",                   // vs 4: dist 1
      6L -> "completely different text here",
      7L -> "xy",                    // vs 4/5: dist 2
      // long-but-repetitive: 2 distinct grams ≪ d·q+1 — outside the
      // prefix theorem, must flow through the degenerate bucket
      8L -> "abababababab",
      9L -> "ababababab",            // vs 8: dist 2
      10L -> "abababababbb"          // vs 8: dist 1 (one substitution)
    ).toDF("id", "s")
    val got = EditDist.editDistancePairs(df, "id", "s", maxDist = 2, q = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "no duplicate pair emissions")
    assert(got.toSet == naive(df, 2))
    assert(got.toSet.contains((1L, 2L, 1L)))
    assert(got.toSet.contains((1L, 3L, 2L)))
    assert(got.toSet.contains((4L, 5L, 1L)))
    assert(got.toSet.contains((4L, 7L, 2L)))
    assert(got.toSet.contains((8L, 9L, 2L)))
    assert(got.toSet.contains((8L, 10L, 1L)))
  }

  test("lossless on real document heads ≡ naive all-pairs; exactly-once bag") {
    val heads = Tables(spark, sf, "documents")
      .select($"doc_id".as("id"),
        concat_ws(" ", slice(split($"text", " "), 1, 5)).as("s"))
    val got = EditDist.editDistancePairs(heads, "id", "s", maxDist = 3, q = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "no duplicate pair emissions")
    assert(got.toSet == naive(heads, 3))
    assert(got.nonEmpty)
  }

  test("q=2 and q=4 agree (the filter is parameter-invariant in results)") {
    val heads = Tables(spark, sf, "documents")
      .select($"doc_id".as("id"),
        concat_ws(" ", slice(split($"text", " "), 1, 4)).as("s"))
    def pairs(q: Int) =
      EditDist.editDistancePairs(heads, "id", "s", maxDist = 2, q = q)
        .as[(Long, Long, Long)].collect().toSet
    assert(pairs(2) == pairs(4) && pairs(2).nonEmpty)
  }
}
