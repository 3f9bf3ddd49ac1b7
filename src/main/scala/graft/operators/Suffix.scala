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
    * @return (p, q, lcp): global positions of each adjacent pair in
    *         rank order, with their exact common-prefix token count
    */
  def adjacentLcp(levels: Seq[(Long, DataFrame)]): DataFrame = {
    val sa = levels.head._2
    val init = sa.select(col("gpos").as("p"), (col("r") + 1L).as("rn"))
      .join(sa.select(col("gpos").as("q"), col("r").as("rn")), Seq("rn"))
      .select(col("p"), col("q"), lit(0L).as("lcp"))
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
        .select(col("p"), col("q"), col("lcp"))
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
