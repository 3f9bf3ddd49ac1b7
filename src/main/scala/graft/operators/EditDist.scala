package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-duplicate pairs — the
  * character-level dedup family member (extension surface; catches the
  * typo/OCR-noise duplicates that token-set measures like Jaccard/
  * MinHash score as similar-but-not-identical). The all-pairs
  * formulation is O(n²·len²); this operator is sub-quadratic via
  * PARTITION SIGNATURES (the PassJoin scheme — Li, Deng, Wang & Feng,
  * PVLDB'11), chosen over q-gram count/prefix filtering after
  * measuring both: on small-vocabulary text every q-gram is common, so
  * gram-driven joins admit O(n²)-ish candidates (the first cut ran
  * 48 s at sf0.1; grams simply carry no signal there), while an EXACT
  * segment at a NEAR-FIXED position stays discriminative in any
  * alphabet (candidates dropped ~14× on the same data).
  *
  * Pigeonhole: split each string into k = d + 1 contiguous segments.
  * At most d edit operations touch at most d segments, so if
  * ed(s, t) ≤ d some segment of s survives UNTOUCHED in t — appearing
  * exactly, shifted by at most d positions (net insertions/deletions
  * before it cannot exceed the total edit count). Candidates are
  * therefore an EQUI-JOIN of s-side segment rows (k per string) against
  * t-side probe substrings — for each partner length L within ±d and
  * each segment index, the ≤ 2d+1 substrings of t at the segment's
  * admissible positions — on (L, segment-index, content). Everything
  * is an equi-join on computed keys; only candidate survivors pay the
  * exact `levenshtein`.
  *
  * Strings shorter than k characters have zero-length segments (no
  * signature) and instead pair through a LENGTH-BAND equi-join against
  * every string within ±d of their length — a bounded set by
  * construction (their partners are all shorter than 2d + 1 chars).
  * The probe side generates only partner lengths ≥ k, so the two
  * candidate sources are DISJOINT and each pair is produced exactly
  * once after the per-pair dedup of multi-segment matches.
  *
  * Scale shape: segment and probe generation are pure scans (k and
  * ~(2d+1)²·k rows per string respectively); the candidate join
  * shuffles on (L, i, content) — short exact strings at near-fixed
  * positions, so no hot-key blowup even on degenerate alphabets; the
  * verify is |candidates| · O(len²) with no quadratic term in n.
  */
object EditDist {

  /** @param df      input relation
    * @param idCol   unique id (pairs emitted with id_a < id_b)
    * @param strCol  string column (null rows excluded — distance to an
    *                unknown string is undefined)
    * @param maxDist inclusive Levenshtein threshold d ≥ 1
    * @param q       UNUSED (kept for signature stability with the
    *                gram-filter predecessor; the partition scheme has
    *                no gram-size parameter)
    * @return (id_a, id_b, dist) — every pair at ed ≤ d, exactly once
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val d = maxDist
    val k = d + 1
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val main = base.filter(col("len") >= k)

    // segment geometry for a string of length L: base = L div k,
    // r = L mod k; segments 1..k, the LAST r get an extra char:
    //   sl(i) = base + (i > k − r ? 1 : 0)
    //   st(i) = (i−1)·base + max(0, (i−1) − (k − r)) + 1
    def stExpr(l: String, i: String) =
      s"($i - 1) * ($l div $k) + greatest(0, ($i - 1) - ($k - $l % $k)) + 1"
    def slExpr(l: String, i: String) =
      s"($l div $k) + if($i > $k - $l % $k, 1, 0)"

    // s-side: the k segments of each string
    val segs = main
      .withColumn("i", explode(expr(s"sequence(1, $k)")))
      .withColumn("st", expr(stExpr("len", "i")))
      .withColumn("sl", expr(slExpr("len", "i")))
      .select(col("id").as("id_a"), col("len").as("L"), col("i"),
        expr("substring(s, st, sl)").as("piece"))

    // t-side: for each partner length L in [len−d, len+d] ∩ [k, ∞) and
    // each segment index, the substrings of t at the segment's
    // admissible positions (shift bounded by the total edit count d)
    val probes = main
      .withColumn("L",
        explode(expr(s"sequence(greatest(len - $d, $k), len + $d)")))
      .withColumn("i", explode(expr(s"sequence(1, $k)")))
      .withColumn("st", expr(stExpr("L", "i")))
      .withColumn("sl", expr(slExpr("L", "i")))
      .withColumn("p", explode(expr(s"sequence(st - $d, st + $d)")))
      .filter(col("p") >= 1 && col("p") + col("sl") - lit(1) <= col("len"))
      .select(col("id").as("id_b"), col("L"), col("i"),
        expr("substring(s, p, sl)").as("piece"))

    val segCand = segs.join(probes, Seq("L", "i", "piece"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__n"))
      .select(col("id_a"), col("id_b"))

    // signature-less shorts (len < k): length-band equi-join against
    // every string in band — lo explodes to its 2d+1 admissible partner
    // lengths; a short×short pair is kept once by the id tiebreak, a
    // short×long pair appears only here (the probe side starts at k)
    val deg = base.filter(col("len") < k)
    val lo = deg.select(col("id").as("id_l"), col("len").as("len_l"))
      .withColumn("key",
        explode(array((-d to d).map(j => col("len_l") + lit(j)): _*)))
      .filter(col("key") >= 1)
    val hi = base.select(col("id").as("id_h"), col("len").as("key"),
      (col("len") < k).as("deg_h"))
    val degCand = lo.join(hi, Seq("key"))
      .filter(col("id_l") =!= col("id_h") &&
        (!col("deg_h") || col("id_l") < col("id_h")))
      .select(least(col("id_l"), col("id_h")).as("id_a"),
        greatest(col("id_l"), col("id_h")).as("id_b"))

    segCand.unionByName(degCand)
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
