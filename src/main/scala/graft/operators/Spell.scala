package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SymSpell-style spelling correction (Garbe's symmetric-delete idea,
  * public since 2012): instead of scanning the dictionary per query
  * (or a quadratic similarity join), both sides expand to their
  * DELETE-NEIGHBORHOODS — the term plus every single-character-deleted
  * variant — and candidates fall out of ONE equi-join on the delete
  * key. Two terms within edit distance 1 always share a key (the
  * shorter one IS a delete of the longer for insert/delete; for a
  * substitution both sides delete the differing position), so recall
  * is exact; a shared key can also pair distance-2 terms (transposed
  * neighbors share a double-sided delete), so candidates are verified
  * with `levenshtein` — an integer DP both engines implement
  * identically — before ranking.
  *
  * Extension surface: the reference has no spell operator; this is the
  * vocabulary-normalization step of a corpus-cleaning pipeline (OCR /
  * scrape noise collapses onto the dominant spelling).
  *
  * Scale shape: each side explodes to O(term length) delete keys —
  * scan-linear — and the join is keyed on the delete string; nothing
  * is ever all-pairs. Short terms are excluded (minLen, default 3):
  * their delete keys ("a" → "") are corpus-universal hot keys that
  * would fan out quadratically, and one-character "corrections" are
  * noise anyway. The per-query candidate set is bounded by the keys'
  * fan-in; ranking is one per-query window over candidates.
  */
object Spell {

  /** The delete-1 neighborhood of `term` as an array: the term itself
    * plus each variant with position i removed, deduplicated
    * ("aa" → ["aa", "a"], not ["aa", "a", "a"]).
    */
  private def deleteKeys(term: org.apache.spark.sql.Column) =
    array_distinct(concat(array(term),
      transform(sequence(lit(1), length(term)), i =>
        concat(term.substr(lit(1), i - 1),
          term.substr(i + 1, lit(1000000))))))

  /** Correct `queries` (one term per row, `qCol`) against a weighted
    * dictionary (`termCol`, `freqCol`): for each query, the top
    * `topK` dictionary terms within edit distance ≤ 1, ranked by
    * (frequency desc, term asc) — the "most popular close spelling"
    * rule. Exact-match queries rank their own spelling first (distance
    * 0 sorts by the same frequency rule).
    *
    * @return (q, term, freq, dist, rn) — rn 1..topK per query
    */
  def corrections(dict: DataFrame, termCol: String, freqCol: String,
      queries: DataFrame, qCol: String,
      topK: Int = 3, minLen: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val d = dict
      .select(col(termCol).as("term"), col(freqCol).cast("long").as("freq"))
      .filter(length(col("term")) >= minLen)
      .select(col("term"), col("freq"),
        explode(deleteKeys(col("term"))).as("key"))
    val q = queries
      .select(col(qCol).as("q")).distinct()
      .filter(length(col("q")) >= minLen)
      .select(col("q"), explode(deleteKeys(col("q"))).as("key"))
    val cand = q.join(d, Seq("key"))
      .select(col("q"), col("term"), col("freq")).distinct()
      .withColumn("dist", levenshtein(col("q"), col("term")))
      .filter(col("dist") <= 1)
    cand
      .withColumn("rn", row_number().over(Window.partitionBy(col("q"))
        .orderBy(col("freq").desc, col("term").asc)))
      .filter(col("rn") <= topK)
      .select(col("q"), col("term"), col("freq"), col("dist"), col("rn"))
  }
}
