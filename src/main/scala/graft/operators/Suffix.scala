package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-rank construction (prefix doubling / the
  * Karp–Miller–Rosenberg repeated-doubling scheme, as in Manber &
  * Myers' suffix-array construction) and the unbounded
  * maximal-duplicated-span detector built on it — the true ExactSubstr
  * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
  * Models Better"), at word-token granularity.
  *
  * [[Curation.duplicatedSpans]] approximates duplication with FIXED-n
  * gram fingerprints: a span is "duplicated" when each covering 5-gram
  * repeats somewhere, so two different documents' unrelated repeats can
  * chain into one span and span length says nothing about how long the
  * actually-shared substring is. This module computes, for every token
  * position p, the EXACT length of the longest substring starting at p
  * that occurs at least twice in the corpus (dup_len(p) = the classic
  * max-of-adjacent-LCPs suffix-array quantity), with no upper bound on
  * span length and no fixed gram width.
  *
  * Scale shape, built entirely from keyed shuffles (no single-partition
  * window, no driver state beyond one long per partition):
  *
  *  1. The corpus is laid out as ONE global token stream by
  *     [[Layout.tokenOffsets]] (two-phase distributed prefix sum), one
  *     slot per token plus one per-document UNIQUE SENTINEL slot. The
  *     sentinels make every suffix distinct and stop any match at the
  *     document boundary, so ranks resolve in O(log max_doc_tokens)
  *     doubling rounds — a function of DOCUMENT length, not corpus
  *     size: 100 TB of 2k-token documents needs the same ~11 rounds as
  *     1 GB of them.
  *  2. Rank doubling: rank_{2L}(p) = dense rank of (rank_L(p),
  *     rank_L(p+L)), missing → −1 (end-padding sorts first, i.e. the
  *     shorter suffix wins ties — standard lexicographic suffix order).
  *     The neighbor lookup is one self equi-join on the dense gpos;
  *     dense ranks are assigned by the [[Relational.allocateIds]]
  *     sort-then-zipWithIndex idiom over the DISTINCT pair set (never
  *     the position set). Each level is `localCheckpoint`-pinned: the
  *     doubling recurrence would otherwise stack K joins of lineage,
  *     and the levels are re-read by the LCP lifting below. (On a real
  *     cluster, reliable `checkpoint` to the cluster FS is the same
  *     call with durability; the memory bill is K ≈ log max_doc_tokens
  *     slim (gpos, rank) relations.)
  *  3. Exact LCPs by BINARY LIFTING over the retained levels: suffix
  *     pairs adjacent in the final rank order walk levels from widest
  *     to width 1, adding 2^k tokens whenever the level-k ranks at the
  *     current offsets agree — K sequential slim joins, O(n log
  *     max_doc_tokens) total join rows.
  *  4. dup_len(p) = max(LCP with the rank predecessor, LCP with the
  *     rank successor) — for a lexicographic order, the max-LCP partner
  *     of any suffix is rank-adjacent (LCP over a rank range is the
  *     range minimum), so the two neighbors are sufficient.
  *  5. Positions with dup_len ≥ minLen emit the interval
  *     [p, p + dup_len − 1] (sentinels guarantee it stays inside the
  *     document) and intervals island-merge per document with the same
  *     one-window pass as the fixed-n family ([[Curation.mergeSpans]]).
  *
  * Engine-exactness: every rank is an equality-class id, and both
  * dup_len and the merged spans are invariant to HOW ties between
  * equal-prefix windows are ordered (only rank EQUALITY enters LCP
  * lifting, and the max-LCP neighbor is adjacent in ANY lexicographic
  * order). A mirror engine may therefore use its own collation and its
  * own doubling depth and still agree bit-for-bit on the output.
  */
object Suffix {

  /** The corpus as one global token stream: one row per token plus one
    * unique per-document sentinel row after the document's last token.
    *
    * @return (doc_id, pos, gpos, flag, key): `pos` 1-based within the
    *         document (sentinel = n_tokens + 1), `gpos` the dense
    *         global slot, `flag` 1 for real tokens / 0 for sentinels
    *         (sentinel keys live in their own namespace so a token
    *         equal to a doc-id string can never collide), `key` the
    *         token text or the sentinel's doc-id string
    */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
    // one slot per token + 1 sentinel slot per doc; tokenOffsets is the
    // two-phase distributed exclusive prefix sum over doc_id order
    val off = Layout.tokenOffsets(
      toks.select(col("doc_id"), (col("n") + 1L).as("slots")),
      "doc_id", "slots")
    val based = toks.join(off.select(col("doc_id"), col("start")), Seq("doc_id"))
    val real = based
      .select(col("doc_id"), col("start"), col("n"),
        posexplode(col("w")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1L).as("pos"),
        (col("start") + col("i0")).as("gpos"), lit(1).as("flag"),
        col("tok").as("key"))
    val sentinels = based.select(col("doc_id"), (col("n") + 1L).as("pos"),
      (col("start") + col("n")).as("gpos"), lit(0).as("flag"),
      col("doc_id").cast("string").as("key"))
    real.unionByName(sentinels)
  }

  /** Dense 0-based ranks AND their count for a DISTINCT key relation:
    * global sort on all columns, then the two-phase id assignment (the
    * [[Relational.allocateIds]] idiom — no single-partition window).
    * ONE eager job (the partition-size scan, which also yields the
    * count the doubling loop needs for its termination test — no
    * separate `.count()` pass); the id assignment itself stays lazy
    * and re-reads the sort's shuffle output. Input rows must be
    * distinct; ties would get different ids.
    */
  private def denseRanksCounted(distinctKeys: DataFrame): (DataFrame, Long) = {
    val spark = distinctKeys.sparkSession
    val sorted = distinctKeys.orderBy(distinctKeys.columns.map(col).toSeq: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField("r", LongType, nullable = false))
    val rdd = sorted.rdd // ONE rdd: both passes reuse its shuffle output
    val sizes = rdd.mapPartitionsWithIndex { case (i, it) =>
        Iterator.single((i, {
          var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
        }))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = sizes.scanLeft(0L)(_ + _)
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = offsets(i)
      it.map { row => val out = Row.fromSeq(row.toSeq :+ k); k += 1; out }
    }
    (spark.createDataFrame(rows, schema), sizes.sum)
  }

  /** Prefix-doubling suffix ranks over a pinned position stream.
    *
    * @param pos   [[positions]] output, already pinned by the caller
    * @param nPos  total slot count (= pos.count(), passed so the one
    *              action is shared with the caller)
    * @return levels widest-first: (window length 2^k, (gpos, r)) with
    *         the HEAD fully resolved (ranks distinct, a suffix-array
    *         permutation); every level localCheckpoint-pinned
    */
  def suffixRankLevels(pos: DataFrame, nPos: Long): Seq[(Long, DataFrame)] = {
    val (rk0, n0) = denseRanksCounted(
      pos.select(col("flag"), col("key")).distinct())
    val r0 = pos.join(rk0, Seq("flag", "key"))
      .select(col("gpos"), col("r")).localCheckpoint()
    var levels = List((1L, r0))
    var nDistinct = n0
    var len = 1L
    // sentinels bound the resolution depth: ranks are distinct once the
    // window covers the longest document + its sentinel. The require is
    // a defensive cap (2^62 would mean the invariant broke, not data).
    while (nDistinct < nPos) {
      require(len < (1L << 50),
        s"suffix ranks failed to resolve by window $len — sentinel invariant broken")
      val (_, cur) = levels.head
      val shifted = cur.select((col("gpos") - len).as("gpos"),
        col("r").as("r2raw"))
      // pinned: consumed twice (distinct keys + the rank join-back),
      // and the next round's shifted self-join reads it twice more
      val paired = cur.join(shifted, Seq("gpos"), "left")
        .select(col("gpos"), col("r").as("r1"),
          coalesce(col("r2raw"), lit(-1L)).as("r2"))
        .localCheckpoint()
      val (ranked, m) = denseRanksCounted(
        paired.select(col("r1"), col("r2")).distinct())
      val next = paired.join(ranked, Seq("r1", "r2"))
        .select(col("gpos"), col("r")).localCheckpoint()
      len *= 2
      levels ::= (len, next)
      nDistinct = m
    }
    levels
  }

  /** Exact LCPs for rank-adjacent suffix pairs by binary lifting over
    * the doubling levels (head level excluded — its ranks are distinct,
    * so it can never contribute).
    *
    * @return (p, q, lcp, sar): global positions of each adjacent pair
    *         in rank order with their exact common-prefix token count;
    *         `sar` is p's 0-based final rank (the pair covers ranks
    *         sar and sar + 1)
    */
  def adjacentLcp(levels: Seq[(Long, DataFrame)]): DataFrame = {
    val sa = levels.head._2
    val init = sa.select(col("gpos").as("p"), col("r").as("sar"),
        (col("r") + 1L).as("rn"))
      .join(sa.select(col("gpos").as("q"), col("r").as("rn")), Seq("rn"))
      .select(col("p"), col("q"), lit(0L).as("lcp"), col("sar"))
    // one left-deep plan (2 joins per level against the PINNED level
    // tables) — no per-level materialization: the whole lift runs as
    // one job when the caller consumes it
    levels.tail.foldLeft(init) { case (pairs, (len, lvl)) =>
      val rp = lvl.select(col("gpos").as("pg"), col("r").as("pr"))
      val rq = lvl.select(col("gpos").as("qg"), col("r").as("qr"))
      pairs
        .withColumn("pg", col("p") + col("lcp"))
        .join(rp, Seq("pg"), "left")
        .withColumn("qg", col("q") + col("lcp"))
        .join(rq, Seq("qg"), "left")
        .withColumn("lcp", col("lcp") +
          when(col("pr").isNotNull && col("pr") === col("qr"), lit(len))
            .otherwise(lit(0L)))
        .select(col("p"), col("q"), col("lcp"), col("sar"))
    }
  }

  /** Per-position duplicated-prefix length: dup_len(gpos) = the exact
    * length of the longest substring starting at gpos that occurs ≥ 2
    * times anywhere in the corpus (self-document repeats included).
    * Sentinel positions are unique by construction and report 0.
    */
  def dupLengths(levels: Seq[(Long, DataFrame)]): DataFrame = {
    val pairs = adjacentLcp(levels)
    pairs.select(col("p").as("gpos"), col("lcp"))
      .union(pairs.select(col("q").as("gpos"), col("lcp")))
      .groupBy(col("gpos")).agg(max(col("lcp")).as("dup_len"))
  }

  /** Maximal duplicated-substring spans, UNBOUNDED length (the exact
    * ExactSubstr span relation): every position opening a duplicated
    * substring of ≥ `minLen` tokens emits its exact-length interval,
    * and intervals island-merge per document.
    *
    * @return one row per maximal span: (idCol, span_start, span_end,
    *         span_tokens, n_pos) — 1-based inclusive token positions;
    *         n_pos = duplicated suffix-start positions merged in
    */
  def maximalDupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val pos = positions(docs, idCol, textCol).localCheckpoint()
    val nPos = pos.count()
    val levels = suffixRankLevels(pos, nPos)
    val hits = dupLengths(levels)
      .filter(col("dup_len") >= minLen)
      .join(pos.filter(col("flag") === 1)
        .select(col("gpos"), col("doc_id"), col("pos")), Seq("gpos"))
      .select(col("doc_id").as(idCol), col("pos"),
        (col("pos") + col("dup_len") - 1L).as("end"))
    Curation.mergeSpans(hits, idCol)
      .withColumnRenamed("n_grams", "n_pos")
  }

  /** The ExactSubstr APPLY step at unbounded length under the
    * REMOVE-ALL-COPIES policy (what Lee et al. 2021's released tool
    * does — every occurrence of a duplicated substring of ≥ `minLen`
    * tokens is cut, including the first): per-document token charge
    * of the [[maximalDupSpans]] relation. The fixed-n sibling
    * [[Curation.trimDuplicatedSpans]] implements the paper TEXT's
    * keep-one-copy policy instead; at unbounded length the canonical
    * copy of overlapping repeats is ill-defined (merged islands have
    * no single owner), so the tool's policy is the exact one.
    *
    * @return one row per document: (idCol, n_tokens, trimmed_tokens,
    *         kept_tokens) — trimmed_tokens 0 for untouched docs
    */
  def trimDupSpansAll(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long): DataFrame = {
    val trimmed = maximalDupSpans(docs, idCol, textCol, minLen)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("trimmed_tokens"))
    docs.select(col(idCol),
        size(graft.functions.TextAnalysis.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .join(trimmed, Seq(idCol), "left")
      .na.fill(0L, Seq("trimmed_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("trimmed_tokens"))
  }

  private val Inf = Long.MaxValue

  /** Pin a recurrence step by materializing its ROWS (RDD local
    * checkpoint) and re-wrapping them as a fresh relation. Equivalent
    * to `Dataset.localCheckpoint` for lineage truncation, but it also
    * RESETS the plan's size statistics — and that is the point: the
    * doubling recurrence below derives each level from TWO references
    * to the previous pinned level, and Catalyst's size-only estimator
    * MULTIPLIES child sizes through a join, so inherited stats double
    * their DIGIT count per level (a ~2^K-digit BigInteger by level K;
    * observed as minutes of BigInteger.multiplyToomCook3 on the
    * driver past K ≈ 12). A fresh LogicalRDD carries the engine
    * default size instead, keeping every downstream stats product
    * bounded. The rank levels' shallower recurrence (digit count
    * ~2^8) stays on Dataset.localCheckpoint, where the rewritten
    * stats are still cheap and useful.
    */
  private def pinRows(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    spark.createDataFrame(rdd, df.schema)
  }

  /** prev_len(gpos) = the EXACT length of the longest prefix of the
    * suffix at gpos that also occurs at some STRICTLY EARLIER global
    * position (any document, any offset; "earlier" = the (doc, pos)
    * stream order). 0 for first occurrences and sentinels.
    *
    * This is the distributed ANSV (all-nearest-smaller-values) step
    * behind exact first-occurrence detection, built with the same
    * doubling + descend idiom as the rank levels and the LCP lift:
    *
    *  - ONE set of SPARSE TABLES by doubling: `tab_k(r)` = (min gpos,
    *    min adjacent-LCP) over ranks [r, r + 2^k) — K = ⌊log2 n⌋
    *    rounds of one self-join each, every level pinned. K grows with
    *    the CORPUS here (unlike the rank levels' document bound) —
    *    the price of a global first-occurrence order; still polylog
    *    rounds of linear keyed shuffles.
    *  - TWO DESCENDS against the same tables: each position walks from
    *    its own rank leftward and rightward, skipping a 2^k block
    *    whenever the block's min gpos proves no earlier-gpos suffix
    *    lives there, accumulating the skipped blocks' LCP-min — K
    *    conditional joins per side, one left-deep plan each.
    *
    * Each walk lands exactly on the NEAREST rank on its side whose
    * suffix began earlier in the corpus, with acc = the min
    * adjacent-LCP over the skipped range — i.e. lcp(suffix_i,
    * suffix_{r*}), which is the best lcp against ANY earlier-gpos
    * suffix on that side (moving past r* only min-reduces the
    * range-min). prev_len = the max of the two sides.
    */
  def prevLengths(levels: Seq[(Long, DataFrame)], nPos: Long): DataFrame = {
    val sa = levels.head._2 // (gpos, r) — ranks dense 0..nPos-1
    val lnext = adjacentLcp(levels)
      .select(col("sar").as("i"), col("lcp").as("lnext"))
    var kMax = 0
    while ((1L << (kMax + 1)) <= nPos) kMax += 1
    val st0 = sa.select(col("r").as("i"), col("gpos").as("g"))
      .join(lnext, Seq("i"), "left").localCheckpoint()
    // sparse tables over SA order: tab_k(r) = (min g over ranks
    // [r, r+2^k), min L over L-indexes [r, r+2^k)); partial blocks at
    // the top pad with Inf (least() keeps the existing half's min)
    var tabs = List((0, pinRows(st0.select(col("i").as("r"),
      col("g").as("mg"),
      coalesce(col("lnext"), lit(Inf)).as("ml")))))
    for (k <- 0 until kMax) {
      val step = 1L << k
      val t = tabs.head._2
      val b = t.select((col("r") - step).as("r"), col("mg").as("bg"),
        col("ml").as("bl"))
      tabs ::= (k + 1, pinRows(t.join(b, Seq("r"), "left")
        .select(col("r"),
          least(col("mg"), coalesce(col("bg"), lit(Inf))).as("mg"),
          least(col("ml"), coalesce(col("bl"), lit(Inf))).as("ml"))))
    }
    val init = st0.select(col("i"), col("g"), col("i").as("c"),
      lit(Inf).as("acc"))
    // LEFT: invariant "ranks in [c, i) are all non-qualifying"; skip
    // block [c-2^k, c-1] when its min g >= g_i (L-range = the same
    // [c-2^k, c-1]); finish at r* = c-1 with L[r*] joined on top
    val leftWalk = tabs.foldLeft(init) { case (w, (k, tab)) =>
      val step = 1L << k
      val sp = tab.select(col("r").as("s"), col("mg"), col("ml"))
      val stepped = w.withColumn("s", col("c") - step)
        .join(sp, Seq("s"), "left")
        .withColumn("skip", col("s") >= 0 && col("mg").isNotNull &&
          col("mg") >= col("g"))
        .select(col("i"), col("g"),
          when(col("skip"), col("s")).otherwise(col("c")).as("c"),
          when(col("skip"), least(col("acc"), col("ml")))
            .otherwise(col("acc")).as("acc"))
      if (k % 8 == 0 && k > 0) pinRows(stepped) else stepped
    }
    val lAtLeft = st0.select((col("i") + 1L).as("c"),
      coalesce(col("lnext"), lit(Inf)).as("lstar"))
    val left = leftWalk.join(lAtLeft, Seq("c"), "left")
      .select(col("i"),
        when(col("c") === 0, lit(0L))
          .otherwise(least(col("acc"), col("lstar"))).as("llen"))
    // RIGHT: invariant "ranks in (i, c] are all non-qualifying"; skip
    // block [c+1, c+2^k] when its min g >= g_i (minG keyed at c+1;
    // L-range = [c, c+2^k-1], keyed at c); finish at r* = c+1 with
    // L[c] joined on top; c past the top rank means no qualifier
    val rightWalk = tabs.foldLeft(init) { case (w, (k, tab)) =>
      val sp = tab.select(col("r").as("s"), col("mg"))
      val spl = tab.select(col("r").as("cc"), col("ml"))
      val stepped = w.withColumn("s", col("c") + 1L)
        .join(sp, Seq("s"), "left")
        .withColumn("cc", col("c"))
        .join(spl, Seq("cc"), "left")
        .withColumn("skip", col("mg").isNotNull && col("mg") >= col("g"))
        .select(col("i"), col("g"),
          when(col("skip"), col("c") + (1L << k)).otherwise(col("c")).as("c"),
          when(col("skip"), least(col("acc"), col("ml")))
            .otherwise(col("acc")).as("acc"))
      if (k % 8 == 0 && k > 0) pinRows(stepped) else stepped
    }
    val lAtRight = st0.select(col("i").as("c"),
      coalesce(col("lnext"), lit(Inf)).as("lstar"))
    val right = rightWalk.join(lAtRight, Seq("c"), "left")
      .select(col("i"),
        when(col("c") >= nPos - 1L, lit(0L))
          .otherwise(least(col("acc"), col("lstar"))).as("rlen"))
    left.join(right, Seq("i"))
      .select(col("i"), greatest(col("llen"), col("rlen")).as("prev_len"))
      .join(sa.select(col("r").as("i"), col("gpos")), Seq("i"))
      .select(col("gpos"), col("prev_len"))
  }

  /** The ExactSubstr APPLY step at unbounded length under the
    * KEEP-FIRST-OCCURRENCE policy (the paper TEXT's "keep one copy",
    * exact and total-order-canonical): every position p whose suffix
    * shares a prefix of ≥ `minLen` tokens with a STRICTLY EARLIER
    * global position is trimmed over exactly that shared extent
    * [p, p + prev_len(p) − 1]; the corpus-wide FIRST occurrence of
    * every duplicated substring survives untouched. Contrast
    * [[trimDupSpansAll]] (removes every copy, the released tool's
    * policy) and [[Curation.trimDuplicatedSpans]] (keep-one-copy but
    * only at fixed gram width). Identical duplicate documents keep
    * exactly one full copy — the earliest.
    *
    * @return one row per document: (idCol, n_tokens, trimmed_tokens,
    *         kept_tokens)
    */
  def trimDupSpansKeepFirst(docs: DataFrame, idCol: String,
      textCol: String, minLen: Long): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val pos = positions(docs, idCol, textCol).localCheckpoint()
    val nPos = pos.count()
    val levels = suffixRankLevels(pos, nPos)
    val hits = prevLengths(levels, nPos)
      .filter(col("prev_len") >= minLen)
      .join(pos.filter(col("flag") === 1)
        .select(col("gpos"), col("doc_id"), col("pos")), Seq("gpos"))
      .select(col("doc_id").as(idCol), col("pos"),
        (col("pos") + col("prev_len") - 1L).as("end"))
    val trimmed = Curation.mergeSpans(hits, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("trimmed_tokens"))
    docs.select(col(idCol),
        size(graft.functions.TextAnalysis.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .join(trimmed, Seq(idCol), "left")
      .na.fill(0L, Seq("trimmed_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("trimmed_tokens"))
  }

  /** The BOILERPLATE REPORT: the corpus's `k` longest maximal
    * duplicated spans WITH their text — the auditor-facing artifact
    * (license headers, navigation chrome, templated paragraphs
    * surface here first). Deterministic total order:
    * (span_tokens desc, id, span_start); ORDER BY + LIMIT plans as
    * TakeOrderedAndProject (no global sort materializes).
    */
  def longestDupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long, k: Int): DataFrame =
    maximalDupSpans(docs, idCol, textCol, minLen)
      .join(docs.select(col(idCol),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("w")), Seq(idCol))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_tokens"),
        concat_ws(" ", slice(col("w"), col("span_start").cast("int"),
          col("span_tokens").cast("int"))).as("span_text"))
      .orderBy(col("span_tokens").desc, col(idCol), col("span_start"))
      .limit(k)
}
