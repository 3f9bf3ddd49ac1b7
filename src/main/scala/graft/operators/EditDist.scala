package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-duplicate pairs — the
  * character-level dedup family member (extension surface; catches the
  * typo/OCR-noise duplicates that token-set measures like Jaccard/
  * MinHash score as similar-but-not-identical and threshold tuning
  * misses). The all-pairs formulation is O(n²·len²); this operator is
  * sub-quadratic via the LOSSLESS q-gram count filter (Gravano et al.,
  * VLDB'01): one edit operation can destroy at most `q` of a string's
  * overlapping character q-grams, so
  *
  *   ed(s, t) ≤ d  ⇒  bag-overlap(grams(s), grams(t))
  *                      ≥ max(|s|, |t|) − q + 1 − d·q
  *
  * (bag overlap = Σ per gram min(tf_s, tf_t)). Candidates come from an
  * inverted q-gram index join (plus the length filter ||s|−|t|| ≤ d,
  * pushed into the join), are count-filtered by the bound, and only
  * survivors pay the exact `levenshtein` verify.
  *
  * Short strings: the bound has pruning power only when
  * max(|s|, |t|) ≥ q·(d+1) (threshold ≥ 1). Strings shorter than that
  * form a SHORT bucket compared all-pairs among themselves via a
  * constant-key hash join — a documented bounded-domain contract (at
  * q=3, d=2 that is strings under 9 chars; for prose corpora a
  * vanishing fraction, and any ed≤d partner of a short string is
  * itself short or long enough to clear the bound: a pair with
  * max ≥ q·(d+1) always goes through the gram path). The two candidate
  * sources are DISJOINT (gram path keeps only max(len) ≥ q·(d+1)
  * pairs), so no distinct pass is needed.
  *
  * Scale shape: grams are one explode+count shuffle; the candidate
  * join shuffles on the gram string — hot grams are AQE skew-join
  * territory like any equi-join (df-capping grams would break the
  * bound's losslessness, so skew is handled by the engine, not by
  * dropping evidence); the verify is |candidates| · O(len²) with no
  * quadratic blowup in n.
  */
object EditDist {

  /** @param df      input relation
    * @param idCol   unique id (pairs emitted with id_a < id_b)
    * @param strCol  string column (null rows excluded — distance to an
    *                unknown string is undefined)
    * @param maxDist inclusive Levenshtein threshold d ≥ 1
    * @param q       gram size ≥ 2
    * @return (id_a, id_b, dist) — every pair at ed ≤ d, exactly once
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"gram size must be >= 2, got $q")
    val shortLim = q * (maxDist + 1)
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))

    // inverted q-gram index with per-string term frequencies
    val grams = base.filter(col("len") >= q)
      .select(col("id"), col("len"),
        explode(expr(s"transform(sequence(1, len - ${q - 1}), " +
          s"i -> substring(s, i, $q))")).as("gram"))
      .groupBy(col("id"), col("len"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val ga = grams.select(col("id").as("id_a"), col("len").as("len_a"),
      col("gram"), col("tf").as("tf_a"))
    val gb = grams.select(col("id").as("id_b"), col("len").as("len_b"),
      col("gram"), col("tf").as("tf_b"))
    val gramCand = ga.join(gb, Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist &&
        greatest(col("len_a"), col("len_b")) >= shortLim)
      .groupBy(col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .agg(sum(least(col("tf_a"), col("tf_b"))).as("common"))
      .filter(col("common") >=
        greatest(col("len_a"), col("len_b")) - lit(q - 1) - lit(maxDist * q))
      .select(col("id_a"), col("id_b"))

    // short bucket: both sides under the bound's reach. The length
    // filter ||s|−|t|| ≤ d is itself a lossless candidate rule here, so
    // shorts pair through a LENGTH-BAND equi-join (never a nested
    // loop): the lo side explodes to its d+1 admissible partner lengths
    // (len..len+d) and meets the hi side on its exact length — a pair
    // with different lengths meets exactly once (shorter side = lo);
    // equal lengths are kept once by the id tiebreak. Hash-join
    // shuffles key on LENGTH, so each band holds only same-length
    // shorts (bounded-domain contract, see Scaladoc).
    val shorts = base.filter(col("len") < shortLim)
    val lo = shorts.select(col("id").as("id_l"), col("len").as("len_l"))
      .withColumn("key",
        explode(array((0 to maxDist).map(k => col("len_l") + lit(k)): _*)))
    val hi = shorts.select(col("id").as("id_h"), col("len").as("len_h"),
      col("len").as("key"))
    val shortCand = lo.join(hi, Seq("key"))
      .filter(col("len_l") < col("len_h") ||
        (col("len_l") === col("len_h") && col("id_l") < col("id_h")))
      .select(least(col("id_l"), col("id_h")).as("id_a"),
        greatest(col("id_l"), col("id_h")).as("id_b"))

    gramCand.unionByName(shortCand)
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
