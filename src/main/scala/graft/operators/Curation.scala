package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond dedup/similarity: benchmark
  * decontamination, cardinality sketching, document chunking, sequence
  * packing, and corpus mixing. Everything here is a declarative
  * DataFrame plan (engine-portable scalar functions only), so Catalyst
  * keeps pushdown/AQE and each operator's cost is one or two keyed
  * shuffles — no driver-side loops, no all-pairs products.
  *
  * Analog in the reference is the curation side of its pipeline
  * (`process_publications_dag.py` clean/enrich stages); these are the
  * additional operations a 100 TB pretraining-data pipeline needs.
  */
object Curation {

  /** Ids of corpus documents that share at least one word n-gram with the
    * benchmark set — the contamination relation of benchmark
    * decontamination (the n-gram-overlap rule used by public LLM
    * training-data pipelines, e.g. GPT-3 appendix C / Dolma).
    *
    * Plan shape: both sides explode to distinct (id, shingle); the join
    * key is the shingle string. The benchmark side is tiny relative to
    * the corpus (eval suites, not web crawls), so its exploded postings
    * broadcast and the corpus postings stream map-side through a
    * broadcast LEFT SEMI — the corpus is never shuffled. At 100 TB the
    * corpus side stays scan-shaped: explode → semi-probe → distinct ids.
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, n)
    val benchSh = Dedup.shingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    corpusSh
      .join(broadcast(benchSh), Seq("shingle"), "left_semi")
      .select(col("id").as(idCol)).distinct()
  }

  /** Corpus minus contaminated documents (anti join on the id). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3): DataFrame =
    corpus.join(contaminatedIds(corpus, benchmark, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** Per-document contamination FRACTION — the graded signal behind
    * [[contaminatedIds]]'s binary any-shared-n-gram rule, for
    * thresholded policies ("drop if ≥ τ of the document's n-grams
    * appear in the benchmark", the form public pipelines actually
    * apply — one stray collocation shouldn't cost a whole document).
    * Share = over each corpus doc's DISTINCT word n-grams, the portion
    * present in the benchmark's n-gram set, as the exact integer ratio
    * `frac_micro = (n_shared · 10⁶) div n_grams`.
    *
    * Same plan shape as [[contaminatedIds]]: the (tiny) benchmark
    * n-gram set broadcasts; the corpus postings take a broadcast LEFT
    * join for the hit flag and one groupBy(doc) — the corpus is never
    * shuffled by the benchmark. Documents shorter than n tokens have
    * no n-grams and are absent (no evidence either way).
    */
  def contaminationFraction(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusSh = Dedup.shingles(corpus, idCol, textCol, n)
    val benchSh = Dedup.shingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct().withColumn("hit", lit(1L))
    corpusSh
      .join(broadcast(benchSh), Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .withColumn("frac_micro", expr("(n_shared * 1000000L) div n_grams"))
      .withColumnRenamed("id", idCol)
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: hash each
    * key to a uniform 60-bit integer (top 15 hex chars of md5), keep the
    * k smallest distinct hashes per group, and estimate
    * |distinct| ≈ (k-1) · 2^60 / kth_min. Unlike HyperLogLog
    * (`approx_count_distinct`), the sketch is a deterministic function
    * of the input in ANY engine with md5 — so the estimate itself can be
    * oracle-verified bit-exactly, and sketches merge by keeping the k
    * smallest of a union (a map-side-combinable agg at scale).
    *
    * Cost: one distinct on (group, hash) — partial agg dedups map-side —
    * then a per-group sort bounded by WindowGroupLimit pushdown (rank
    * filter `rk <= k` prunes before the full window sort materializes).
    * Returns (groupCols*, n_seen, kth_hash, est_distinct): when a group
    * has fewer than k distinct keys the estimate is the exact count.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val two60 = 1152921504606846976.0 // 2^60, exact as a double
    val h = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("h").asc)
    df.select(gs :+ h.as("h"): _*)
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble * two60) / col("kth_hash").cast("double")))
  }

  /** Per-group KMV sketch RELATION — (groupCols…, h): the k smallest
    * distinct 60-bit md5 hashes of `key` per group, the mergeable state
    * behind [[kmvDistinct]] exposed as rows so SET ALGEBRA can run on
    * sketches alone. The k-min of a union is computable from the unions
    * of k-mins (every union k-min is a k-min of its own side), which is
    * what [[kmvJaccard]] exploits. ≤ k rows per group; same
    * WindowGroupLimit-pruned rank filter as [[kmvDistinct]].
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val h = conv(substring(md5(key), 1, 15), 16, 10).cast("long")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("h").asc)
    df.select(gs :+ h.as("h"): _*)
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }

  /** Pairwise SET-OVERLAP estimates between every two groups, computed
    * from their [[kmvSketch]] rows alone — the data is never re-read
    * (corpus-overlap auditing: which sources share content, roughly how
    * much, without an all-pairs document comparison). For a group pair
    * (a, b): U = the k smallest distinct hashes of sketch(a) ∪
    * sketch(b) — a valid KMV sketch of the union — and the Jaccard
    * estimate is the fraction of U's members present in BOTH side
    * sketches (the standard KMV set-operation estimator, Beyer et al.
    * SIGMOD'07), emitted as the exact integer ratio
    * `jaccard_micro = (inter_n · 10⁶) div u_n` plus the raw counts, so
    * the whole computation is engine-reproducible.
    *
    * Plan shape: the group list (one row per group — sources,
    * languages) is collected to the driver to emit the tiny pair
    * relation (bounded like the IVF centroid collects; G groups →
    * G·(G−1)/2 pairs), which then BROADCASTS and joins the sketch rows
    * by EQUALITY on the group key — never a cross product, and the
    * sketch side (≤ G·k rows) is the only shuffle input. Scale-safe
    * whenever the number of GROUPS is driver-small, which is the
    * operator's domain (corpus sources), not the corpus itself.
    */
  def kmvJaccard(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val spark = sketch.sparkSession
    import spark.implicits._
    val groups = sketch.select(col(groupCol).cast("string")).distinct()
      .as[String].collect().sorted.toIndexedSeq
    // internal names are __-prefixed so a user group column named
    // g/g_a/g_b can never collide (ambiguous-reference guard)
    val pairSides = (for {
      i <- groups.indices; j <- (i + 1) until groups.size
      g <- Seq(groups(i), groups(j))
    } yield (groups(i), groups(j), g)).toDF("__ga", "__gb", "__g")
    val w = Window.partitionBy(col("g_a"), col("g_b"))
      .orderBy(col("h").asc)
    sketch.join(broadcast(pairSides), sketch(groupCol) === pairSides("__g"))
      .groupBy(col("__ga").as("g_a"), col("__gb").as("g_b"), col("h"))
      .agg(
        max(when(col(groupCol) === col("__ga"), 1).otherwise(0)).as("in_a"),
        max(when(col(groupCol) === col("__gb"), 1).otherwise(0)).as("in_b"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("u_n"),
        sum((col("in_a") * col("in_b")).cast("long")).as("inter_n"))
      .withColumn("jaccard_micro",
        expr("(inter_n * 1000000L) div u_n"))
  }

  /** Sliding-window chunking: split each document into fixed-size token
    * windows every `stride` tokens — the map from raw documents to
    * model-ready training sequences (stride < size gives overlapping
    * context windows). Pure scan + explode: zero shuffles, fully
    * parallel, output rows carry (doc_id, chunk_id, n_tokens, chunk_fp).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, s"width/stride must be >= 1: $width/$stride")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol), toks.as("toks"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(
        col(idCol),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(lit(width), size(col("toks")) - col("start")).cast("long")
          .as("n_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start") + 1, lit(width))))
          .as("chunk_fp"))
  }

  /** Contiguous-fill sequence packing: within each `partCol` stratum,
    * documents (in deterministic `orderCol` order) fill fixed
    * token-budget shards back to back; a document lands in shard
    * floor((cumulative_tokens - its_tokens) / budget) — i.e. the shard
    * where its first token falls. One window shuffle partitioned by the
    * stratum: strata pack in parallel, and the running sum is the only
    * sequential dependency (per stratum, not global). Returns per-shard
    * stats (n_docs, tok_sum, fill ratio) — the shard manifest a training
    * job would read.
    */
  def packShards(docs: DataFrame, partCol: String, orderCol: String,
      tokens: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(partCol), col(orderCol), tokens.cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("shard", ((col("cum") - col("tok")) / budget).cast("long"))
      .groupBy(col(partCol), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tok_sum"))
      .withColumn("fill", col("tok_sum").cast("double") / budget)
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", table A1): the fraction of the most
    * frequent word n-gram and the fraction of duplicated n-gram
    * occurrences. Documents failing either bound are boilerplate /
    * looping-generator suspects the quality gate drops.
    *
    * Scale shape: explode n-grams (multiset, stride 1) → one map-side-
    * combinable count per (doc, gram) → one re-group per doc. Two keyed
    * shuffles, scan-linear, no windows. Documents shorter than n words
    * emit no n-grams and are absent from the output (nothing to score).
    * Fractions are single correctly-rounded double divisions of exact
    * integer counts — bit-identical in any engine (oracle-safe).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, topFracMax: Double = 0.2, dupFracMax: Double = 0.6): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(graft.functions.TextAnalysis.wordNGrams(col(textCol), n)).as("gram"))
    grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col(idCol), col("n_grams"),
        (col("top_count").cast("double") / col("n_grams")).as("top_gram_frac"),
        ((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
          .as("dup_gram_frac"))
      .withColumn("is_repetitive",
        col("top_gram_frac") > topFracMax || col("dup_gram_frac") > dupFracMax)
  }

  /** ExactSubstr-style duplicated-span fraction per document (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"),
    * at word-n-gram granularity: the fraction of a document's n-gram
    * occurrences that also appear in at least one OTHER document. High
    * fractions mark documents that are largely assembled from text
    * duplicated elsewhere in the corpus — partial-overlap cases whole-doc
    * dedup cannot see.
    *
    * Scale shape: explode → distinct postings → document frequency per
    * gram fingerprint → join postings back on the fingerprint. All keyed
    * shuffles; the join fans out 1:1 (one df row per fingerprint), so a
    * corpus-wide hot gram costs its posting count, never a quadratic
    * bucket. The md5 fingerprint keeps shuffle keys fixed-width.
    */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, dupFracMin: Double = 0.3): DataFrame = {
    val grams = docs.select(col(idCol),
        explode(graft.functions.TextAnalysis.wordNGrams(col(textCol), n)).as("gram"))
      .select(col(idCol), md5(col("gram")).as("fp"))
    val docFreq = grams.distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("nd"))
    grams.join(docFreq, "fp")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac", col("n_dup").cast("double") / col("n_grams"))
      .withColumn("is_dup_heavy", col("dup_frac") >= dupFracMin)
  }

  /** Maximal duplicated-substring SPANS per document (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" —
    * ExactSubstr, at word-n-gram granularity): a position is
    * duplicated when its n-gram occurs ≥ `minCount` times in the
    * corpus (any document, self included — unlike [[stripDupSpans]]'s
    * cross-doc document-frequency rule); duplicated positions whose
    * gram windows overlap or touch coalesce into maximal spans.
    * Division of labor in the family: [[dupNgramStats]] reports the
    * per-doc FRACTION, [[stripDupSpans]] cuts cross-doc boilerplate
    * from every copy, this materializes WHERE the duplication sits
    * (the span relation an auditor or a targeted trim consumes), and
    * [[trimDuplicatedSpans]] applies the paper's keep-one-copy
    * policy.
    *
    * Scale shape: explode → gram-fingerprint count (map-side combined)
    * → join the postings back on the fingerprint (1:1 fan-out — one
    * row per fingerprint, so a corpus-wide hot gram costs its posting
    * count, never a quadratic bucket) → ONE per-doc window pass
    * (running max end + cumulative break flag, the classic island
    * merge) → span aggregate. All keyed shuffles, no driver state.
    *
    * @return (idCol, span_start, span_end, span_tokens, n_grams), one
    *         row per maximal span, 1-based inclusive token positions
    */
  /** Positional n-gram fingerprints: (idCol, pos, fp) with 1-based
    * token positions and md5-of-gram-text fingerprints (fixed-width
    * shuffle keys).
    */
  private def positionalGrams(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(graft.functions.TextAnalysis.wordNGrams(col(textCol), n))
          .as(Seq("i0", "gram")))
      .select(col(idCol), (col("i0") + 1).as("pos"),
        md5(col("gram")).as("fp"))

  /** Classic island merge over (idCol, pos, end) gram-hit rows: ONE
    * per-doc window pass — running max end (frame ending 1 PRECEDING)
    * + cumulative break flag. A gap strictly wider than adjacency
    * breaks the island: pos ≤ prev_end merges overlap, pos = prev_end
    * + 1 merges touching gram windows (the covered token run stays
    * contiguous).
    */
  private[operators] def mergeSpans(hits: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("prev_end", max(col("end"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("s").cast("long").as("span_start"),
        col("e").cast("long").as("span_end"),
        (col("e") - col("s") + 1).cast("long").as("span_tokens"),
        col("n_grams"))
  }

  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = positionalGrams(docs, idCol, textCol, n)
    val dupFp = grams.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("fp"))
    val hits = grams.join(dupFp, Seq("fp"))
      .select(col(idCol), col("pos"), (col("pos") + (n - 1)).as("end"))
    mergeSpans(hits, idCol)
  }

  /** The ExactSubstr dedup APPLY step under the paper's KEEP-ONE-COPY
    * policy (Lee et al. 2021): every occurrence of a duplicated n-gram
    * is trimmed EXCEPT the corpus-wide canonical first occurrence —
    * the (doc_id, pos)-least hit of its fingerprint, a deterministic
    * stand-in for "keep one copy". Contrast [[stripDupSpans]], which
    * removes ALL copies of cross-doc boilerplate (df > maxDf) and
    * ignores within-doc repetition; here intra-doc repeats count and
    * exactly one occurrence survives. Foreign hits island-merge per
    * document ([[mergeSpans]]) and the covered token count is charged
    * against the document's length.
    *
    * Scale shape: one gram aggregate carrying BOTH the count and the
    * struct-min owner (map-side combined — min of (doc, pos) structs
    * is associative), one 1:1 join back, one per-doc window, one
    * per-doc sum, one left join against token counts. No driver
    * state.
    *
    * @return one row per document: (idCol, n_tokens, trimmed_tokens,
    *         kept_tokens) — trimmed_tokens 0 for untouched docs
    */
  def trimDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minCount: Long = 2L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = positionalGrams(docs, idCol, textCol, n)
    val owners = grams
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("c"),
        min(struct(col(idCol).as("d"), col("pos").as("p"))).as("owner"))
      .filter(col("c") >= minCount)
      .select(col("fp"), col("owner"))
    val foreign = grams.join(owners, Seq("fp"))
      .filter(!(col(idCol) === col("owner.d") && col("pos") === col("owner.p")))
      .select(col(idCol), col("pos"), (col("pos") + (n - 1)).as("end"))
    val trimmed = mergeSpans(foreign, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("trimmed_tokens"))
    docs.select(col(idCol),
        size(graft.functions.TextAnalysis.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .join(trimmed, Seq(idCol), "left")
      .na.fill(0L, Seq("trimmed_tokens"))
      .withColumn("kept_tokens", col("n_tokens") - col("trimmed_tokens"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash
    * every word k-gram, slide a w-window over the hash sequence, keep
    * each window's MINIMUM hash, rightmost position on ties.
    * Guarantees: any shared substring of ≥ w + k − 1 tokens
    * contributes at least one COMMON selected fingerprint, and ~2/(w+1)
    * of positions are selected — the local, position-robust sketch
    * whole-document hashing ([[graft.functions.TextAnalysis]]
    * fingerprint) cannot give.
    *
    * The rightmost-tie rule rides the same min() as the hash itself:
    * min of the struct (h, −pos) is the smallest hash then the largest
    * position, and both Spark and DuckDB order structs field-by-field,
    * so selection is deterministic cross-engine. One per-doc window
    * pass; only full windows select (a doc shorter than w + k − 1
    * tokens yields no fingerprints).
    *
    * @return distinct (idCol, fp_pos, fp) selected fingerprints,
    *         1-based gram positions
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val grams = docs.select(col(idCol),
        posexplode(graft.functions.TextAnalysis.wordNGrams(col(textCol), k))
          .as(Seq("i0", "gram")))
      .select(col(idCol), (col("i0") + 1).as("pos"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("m", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .withColumn("n_in", count(lit(1)).over(win))
      .filter(col("n_in") === w)
      .select(col(idCol), (-col("m.np")).cast("long").as("fp_pos"),
        col("m.h").as("fp"))
      .distinct()
  }

  /** Temperature-sampling mix weights per stratum — the corpus-mix
    * planning step before [[mixByEpochs]]: exact integer doc/token
    * counts, each stratum's token share, and the temperature-adjusted
    * weight sqrt(n_g)/sqrt(N) (T = 0.5 in the p_g ∝ n_g^T family —
    * the standard flattening that keeps low-resource strata from
    * vanishing, cf. multilingual sampling in public LM pipelines).
    *
    * The weight is DELIBERATELY left unnormalized: normalizing needs a
    * sum of G doubles whose value depends on addition order — not
    * reproducible across engines/partitionings. sqrt and division are
    * IEEE correctly-rounded, so these weights are bit-identical anywhere;
    * the client normalizes over its G-row manifest if it needs p values.
    *
    * One agg shuffle; the grand total is a window over the G-row
    * aggregated frame (G = #strata, driver-bounded by definition).
    */
  def mixWeights(docs: DataFrame, groupCols: Seq[String], tokens: Column): DataFrame = {
    val g = docs.select(groupCols.map(col) :+ tokens.cast("long").as("tok"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
    val all = Window.partitionBy()
    g.withColumn("total_tokens", sum(col("n_tokens")).over(all))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("total_tokens"))
      .withColumn("temp_weight",
        sqrt(col("n_tokens").cast("double")) / sqrt(col("total_tokens").cast("double")))
  }

  /** Weighted corpus mixing by epoch replication: each stratum key gets
    * an integer epoch count (e.g. high-quality sources oversampled 2-3×,
    * the long tail once); every document is replicated once per epoch
    * with a deterministic per-replica shuffle key, so downstream
    * repartitionByRange(mix_key) interleaves sources uniformly into
    * training shards. Scan + explode over a broadcast-size epoch map:
    * zero shuffles here; the global interleave is the range partition
    * that follows.
    */
  def mixByEpochs(docs: DataFrame, idCol: String, keyCol: String,
      epochs: Map[String, Int], defaultEpochs: Int = 1): DataFrame = {
    require((defaultEpochs +: epochs.values.toSeq).forall(_ >= 0),
      "epoch counts must be >= 0")
    val epochExpr = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs)) {
      case (acc, (k, n)) => when(col(keyCol) === k, lit(n)).otherwise(acc)
    }
    // epoch count 0 drops the stratum: explode of an empty array emits
    // no rows (sequence(1, 0, step=1) would be invalid, so gate on >= 1)
    val epochSeq = when(epochExpr >= 1, sequence(lit(1), epochExpr, lit(1)))
      .otherwise(array().cast("array<int>"))
    docs
      .withColumn("epoch", explode(epochSeq))
      .withColumn("mix_key",
        md5(concat(lit("mix:"), col(keyCol), lit(":"),
          col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
  }

  /** Length stratification: NTILE(`tiles`) buckets per stratum over a
    * deterministic (length, id) order, with exact per-tile token stats —
    * the curriculum/packing pre-step that splits each language into
    * equal-count length bands (short-context vs long-context training
    * splits). One window shuffle on the stratum key, reused by the
    * following aggregate; stats are exact integers (no FP drift).
    * Ties break on the id so tile assignment is reproducible across
    * engines and partitionings.
    */
  def lengthStrata(docs: DataFrame, partCol: String, idCol: String,
      tokens: Column, tiles: Int): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    val w = Window.partitionBy(col(partCol))
      .orderBy(col("tok").asc, col(idCol).asc)
    docs.select(col(partCol), col(idCol), tokens.cast("long").as("tok"))
      .withColumn("tile", ntile(tiles).over(w))
      .groupBy(col(partCol), col("tile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"),
        min(col("tok")).as("tok_min"), max(col("tok")).as("tok_max"))
  }

  /** Deterministic 0-99 bucket of an id: first 15 hex chars of
    * md5("<tag><id>") as a long, mod 100 — reproducible across engines
    * (oracles render the identical arithmetic) and stable under
    * repartition, which a rand() bucket is not. The ONE definition the
    * sampling (q75), doc-level split (q107) and [[clusterAwareSplit]]
    * queries all share, so their bucket spaces can never silently
    * diverge.
    */
  def md5Bucket(tag: String, id: Column): Column =
    (conv(substring(md5(concat(lit(tag), id.cast("string"))), 1, 15),
      16, 10).cast("long") % 100).cast("int")

  /** Leakage-safe train/val/test split: the split is assigned per
    * NEAR-DUP CLUSTER (connected component of `pairs`), not per document
    * — a doc-level hash split places near-duplicate twins on both sides
    * of the train/eval boundary, silently inflating eval scores. The
    * bucket hashes the component representative, so every member of a
    * cluster lands in the same split; singletons hash their own id
    * (component = id), which is exactly the plain doc-level split.
    * Buckets are md5-derived — reproducible across engines and stable
    * under repartition. Appends a `split` column.
    *
    * Scale shape: components as usual (keyed shuffles / bounded driver
    * fast path), one label-attach join, and a scan-side bucket
    * expression — no extra shuffle beyond the attach.
    */
  def clusterAwareSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 90, valPct: Int = 5, seedTag: String = "split:",
      upstream: Dedup.CacheHandle = Dedup.CacheHandle.untracked): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100; " +
        s"got $trainPct/$valPct")
    val labels = Dedup.connectedComponents(df.select(col(idCol)), idCol,
        pairs, upstream = upstream)
      .withColumnRenamed("id", "__cid")
    val bucket = md5Bucket(seedTag, col("component"))
    df.join(labels, col(idCol) === col("__cid"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__cid", "component")
  }

  /** Per-source quota cap — the domain-cap curation rule (a single crawl
    * source/domain must not dominate the corpus, cf. the per-domain caps
    * of public web-corpus pipelines): keep at most `cap` docs per
    * source, priority (score desc, id asc). ONE ranking window on the
    * source key; with an integer score the kept set is bit-deterministic
    * in any engine. At scale this is the same single keyed shuffle as
    * any per-group top-k — AQE splits a skewed source's sort.
    */
  def sourceQuota(docs: DataFrame, srcCol: String, idCol: String,
      score: Column, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(score.desc, col(idCol).asc)
    docs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Deterministic training-order shuffle: every doc gets a reproducible
    * (shard, position) — shard = md5(tag+id) mod `nShards`, position =
    * rank within the shard by the same hash (id tiebreak). The "global
    * shuffle before training" op: the order is independent of input
    * partitioning and arrival (a rand() shuffle is neither reproducible
    * nor engine-portable), and the plan is ONE keyed shuffle by shard +
    * per-shard sort — never a global sort. Readers consume shards
    * round-robin for an epoch-stable stream.
    */
  def trainOrderShuffle(docs: DataFrame, idCol: String, nShards: Int,
      tag: String = "shuffle:"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // 15 hex chars → 60-bit nonnegative long: % and pmod agree, and any
    // engine's md5 renders the identical value
    val h = conv(substring(md5(concat(lit(tag), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    docs.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("position", row_number().over(w))
      .drop("__h")
  }

  /** Source-concentration diagnostic per stratum: distinct item count and
    * the Herfindahl–Hirschman index sum((c_i/N)²) of the item distribution
    * — the "is this language dominated by one crawl source?" curation
    * check (HHI → 1 means a single source; → 1/k means k equal sources).
    * Two keyed aggregates (map-side combined); the HHI is ONE double
    * division of EXACT integer arithmetic — squares and the N² are
    * computed in decimal(38,0) (never LongType, whose non-ANSI multiply
    * silently wraps past ~3·10⁹), each side rounded to double exactly
    * once, matching an exact-integer oracle (DuckDB HUGEINT) bit-for-bit.
    * Valid while per-group sums stay below 10³⁸ — i.e. any Long row count.
    */
  def concentration(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.groupBy(col(groupCol), col(itemCol)).agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"), sum(col("c")).as("n_rows"),
        sum(col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
          .as("sum_sq"))
      .select(col(groupCol), col("n_items"), col("n_rows"),
        (col("sum_sq").cast("double") /
          (col("n_rows").cast("decimal(19,0)") *
            col("n_rows").cast("decimal(19,0)")).cast("double")).as("hhi"))

  // ------------------------------------------------------------------
  // Log-histogram quantile sketch — quantiles at corpus scale without a
  // per-group sort. q98's exact `percentile` materializes each group's
  // values; this sketch is O(#groups × 64) state, mergeable by ADDITION
  // (bucket counts sum — spec proves K partial merges ≡ bulk build), at
  // the cost of a deterministic factor-2 value error: the estimate for
  // a value x is the bucket ceiling 2^⌈log2 x⌉ − 1 ∈ [x, 2x). The KMV
  // twin for distinct counts is [[kmvDistinct]]; both are integer-exact
  // programs, no transcendentals, so every engine agrees bit-for-bit.
  // ------------------------------------------------------------------

  /** Micro-resolution uniform hash in [0, 1e6) from (tag, id) — the
    * fine-grained sibling of [[md5Bucket]] for probability-weighted
    * decisions (md5Bucket's 100 buckets only resolve whole percents).
    */
  def md5Micro(tag: String, id: Column): Column =
    conv(substring(md5(concat(lit(tag), id.cast("string"))), 1, 15),
      16, 10).cast("long") % 1000000L

  /** Deterministic WEIGHTED Bernoulli sample: keep a row iff its
    * (tag, id)-hash micro-uniform falls below `weightMicro` ∈ [0, 1e6]
    * — inclusion probability weightMicro/1e6 per row, independent
    * across rows, reproducible across engines and partitionings (pure
    * function of the id). The quality/length-proportional subsampling
    * shape: weight long or high-quality documents up, boilerplate down.
    * For unbiased downstream sums reweight kept rows by 1e6/weight
    * (Horvitz-Thompson). Scan-linear, zero shuffles.
    */
  def weightedSample(df: DataFrame, idCol: String, weightMicro: Column,
      seedTag: String = "wsmp:"): DataFrame =
    df.filter(md5Micro(seedTag, col(idCol)) < weightMicro)

  /** Token-BUDGET mixture draw: per `groupCol`, take rows in
    * (md5-hash, id) order until the group's running `tokCol` sum
    * exceeds `budgetTokens` — the reproducible "draw N tokens per
    * source" primitive behind mixture construction (mixWeights decides
    * budgets; this executes a draw). The hash order is a deterministic
    * shuffle (pure function of the id), so the draw is engine- and
    * partitioning-reproducible, and a re-run with a larger budget
    * EXTENDS the smaller draw rather than resampling. Adds `cum_tok`
    * (the running sum including the row). Scale shape: one ranking
    * window per group, no global sort.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, groupCol: String,
      tokCol: String, budgetTokens: Long,
      seedTag: String = "mix:"): DataFrame = {
    require(budgetTokens >= 1,
      s"budgetTokens must be >= 1, got $budgetTokens")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", md5Micro(seedTag, col(idCol)))
      .withColumn("cum_tok", sum(col(tokCol)).over(w))
      .filter(col("cum_tok") <= budgetTokens)
      .drop("__h")
  }

  /** Per-group DISTRIBUTION-DRIFT monitor — the data-quality alarm a
    * multi-source ingest pipeline runs nightly: how far does each
    * source's token distribution sit from the corpus baseline? Tokens
    * hash into `nBuckets` md5 buckets (the DSIR hashed-feature idea;
    * md5 so the DuckDB mirror replays identical bucket ids), each
    * group's bucket histogram compares to the corpus histogram by
    * TOTAL VARIATION DISTANCE in micro units:
    *
    *   tvd_micro(g) = Σ_b |o_b·10⁶ DIV n_g − c_b·10⁶ DIV N|
    *
    * — pure INTEGER division throughout (not even an IEEE op), so the
    * report is engine- and partitioning-exact. 0 = identical mix,
    * 2·10⁶ = disjoint support (the metric is 2× the classic TVD).
    * A drifting source (new crawl behavior, encoding bug, spam influx)
    * rises without any model in the loop. Scale: one token-stream
    * aggregation to (group, bucket) — nBuckets·groups rows — then a
    * broadcast join of two tiny histograms. Overflow: o_b·10⁶ needs
    * o_b < 9.2·10¹² tokens per (group, bucket); past that swap to
    * DECIMAL(38,0).
    *
    * @return (groupCol, n_tokens, tvd_micro) per group
    */
  def bucketDriftTvd(docs: DataFrame, textCol: String, groupCol: String,
      nBuckets: Int = 64): DataFrame =
    driftTvdFromCounts(
      driftBucketCounts(docs, textCol, groupCol, nBuckets),
      groupCol, nBuckets)

  /** The SUM-MERGEABLE half of [[bucketDriftTvd]]: per-(group, bucket)
    * token counts. Counts over a union of slices equal the summed
    * counts of each slice (exact integer addition), which is what lets
    * a streaming ingest maintain them one micro-batch partition at a
    * time and still serve the batch-identical drift report.
    */
  def driftBucketCounts(docs: DataFrame, textCol: String,
      groupCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    docs.select(col(groupCol),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("drift:"), col("tok"))), 1, 15),
          16, 10).cast("long") % nBuckets.toLong)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("o"))
  }

  /** The SCORING half of [[bucketDriftTvd]], over an already-reduced
    * (group, bucket, o) count relation (merge slices by summing `o`
    * first — [[driftBucketCounts]]).
    */
  def driftTvdFromCounts(byGroup: DataFrame, groupCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val totals = byGroup.groupBy(col(groupCol))
      .agg(sum(col("o")).as("n_tokens"))
    val corpus = byGroup.groupBy(col("bucket")).agg(sum(col("o")).as("c"))
      .withColumn("n_total", sum(col("c")).over(Window.partitionBy()))
    // the full (group × bucket) grid via a STATIC bucket explode — a
    // bucket the group never hits still contributes |0 − c·1e6 DIV N|;
    // no cross join, the bucket list is a literal array
    val grid = totals.withColumn("bucket",
      explode(lit((0L until nBuckets.toLong).toArray)))
    grid
      .join(byGroup, Seq(groupCol, "bucket"), "left")
      .join(broadcast(corpus), Seq("bucket"))
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .groupBy(col(groupCol), col("n_tokens"))
      .agg(sum(abs(
        expr("o * 1000000L div n_tokens") -
          expr("c * 1000000L div n_total"))).as("tvd_micro"))
      .select(col(groupCol), col("n_tokens"), col("tvd_micro"))
  }

  /** Per-source corpus-LM surprisal stats — [[bigramSurprisal]]'s
    * per-doc signal rolled up by `srcCol`: (source, n_docs, n_bigrams,
    * sum_bits), all exact integers. The per-domain "loss" proxy
    * [[doremiWeights]] feeds on.
    */
  def sourceSurprisalStats(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String): DataFrame =
    bigramSurprisal(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol)), Seq("doc_id"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        sum(col("sum_bits")).as("sum_bits"))

  /** DoReMi-STYLE domain reweighting (Xie et al. 2023, reduced to the
    * engine's own signal): DoReMi multiplicatively up-weights domains
    * with EXCESS proxy-model loss — here the proxy loss is the corpus
    * bigram-LM surprisal ([[bigramSurprisal]], no transcendentals in
    * the engine), so domain i's weight is
    *
    *   w_i ∝ share_i · exp(η · (bits_i − min_j bits_j))
    *
    * with share_i the domain's doc share and bits_i its mean surprisal.
    * The exp runs ONCE on the driver ([[StrictMath]], over the bounded
    * per-source stats — the DSIR/centroid literal pattern); weights are
    * micro-normalized to sum ≈ 1e6 (floor rounding). Returns the
    * per-source stats relation with `weight_micro` joined on — the
    * mixture a training-data sampler consumes (e.g. via
    * [[weightedSample]] or budget draws).
    */
  def doremiWeights(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, eta: Double = 1.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = sourceSurprisalStats(docs, idCol, textCol, srcCol)
    val lits = doremiWeightLiterals(
      stats.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq, eta)
      .toDF(srcCol, "weight_micro")
    stats.join(broadcast(lits), Seq(srcCol))
  }

  /** The driver half of [[doremiWeights]], public so the DuckDB mirror
    * generator replays the identical literals: takes the collected
    * (source, n_docs, n_bigrams, sum_bits) rows, returns micro weights
    * sorted by source.
    */
  def doremiWeightLiterals(stats: Seq[(String, Long, Long, Long)],
      eta: Double): Seq[(String, Long)] = {
    require(stats.nonEmpty, "doremiWeights: no sources")
    require(eta >= 0.0, s"eta must be >= 0, got $eta")
    val nTotal = stats.map(_._2).sum.toDouble
    val bits = stats.map { case (_, _, nb, sb) =>
      if (nb == 0) 0.0 else sb.toDouble / nb }
    val minBits = bits.min
    val raw = stats.zip(bits).map { case ((_, nd, _, _), b) =>
      (nd / nTotal) * StrictMath.exp(eta * (b - minBits)) }
    val z = raw.sum
    stats.map(_._1).zip(raw).map { case (s, w) =>
      (s, math.floor(w / z * 1e6).toLong) }.sortBy(_._1)
  }

  /** TEMPERATURE-scaled group quotas — the multilingual-LM α-sampling
    * rule (Lample & Conneau 2019's p_i ∝ n_i^α; mC4/XLM-R use
    * α ≈ 0.3–0.7 to up-sample tail languages without flattening the
    * head): given per-group sizes n_i, group i's share of `budget` rows
    * is n_i^α / Σ_j n_j^α, capped at n_i. Computed ONCE on the driver
    * with [[StrictMath]] over the bounded group-count relation (the
    * trained-centroid/DSIR literal pattern — the only non-rational op,
    * pow, never runs inside an engine), floor-rounded, deterministic.
    */
  def temperatureQuotas(df: DataFrame, groupCol: String, alpha: Double,
      budget: Long): Seq[(String, Long)] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val w = counts.map { case (_, n) => StrictMath.pow(n.toDouble, alpha) }
    val sumW = w.sum
    counts.zip(w).map { case ((g, n), wi) =>
      (g, math.min(n, math.floor(budget * wi / sumW).toLong))
    }.toSeq
  }

  /** Execute a temperature draw: group i keeps its first
    * [[temperatureQuotas]] rows in deterministic (md5-hash, id) order —
    * tail groups keep a LARGER fraction of themselves than head groups
    * (α < 1 up-samples the tail relatively), and a re-run with a larger
    * budget extends the draw ([[tokenBudgetMix]]'s property). One
    * ranking window per group over a broadcast quota relation; no
    * global sort.
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, budget: Long, seedTag: String = "temp:"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quotas = temperatureQuotas(df, groupCol, alpha, budget)
      .toDF(groupCol, "quota")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", md5Micro(seedTag, col(idCol)))
      .withColumn("pos", row_number().over(w).cast("int"))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("pos") <= col("quota"))
      .drop("__h", "quota")
  }

  /** Robust per-group OUTLIER gate: flag rows whose `valueCol` sits
    * more than `nMads` MADs (median absolute deviations) from the
    * group median — the median/MAD filter that survives the heavy
    * tails a mean/stddev gate is wrecked by. Returns the flagged rows
    * with `med` and `mad` attached. The comparison stays in
    * |x − med| > n·mad space (exact-integer vs double product), no
    * engine-specific double literals. Scale shape: two grouped
    * percentile aggregations plus an equi-join on the group key —
    * per-group state is O(1), no window over the corpus.
    */
  def robustOutlierGate(df: DataFrame, groupCol: String,
      valueCol: String, nMads: Int = 2): DataFrame = {
    require(nMads >= 1, s"nMads must be >= 1, got $nMads")
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val mad = df.join(med, groupCol)
      .groupBy(col(groupCol))
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"),
        first(col("med")).as("med"))
    df.join(mad, groupCol)
      .filter(abs(col(valueCol) - col("med")) > lit(nMads) * col("mad"))
  }

  /** ExactSubstr-style dup-span REMOVAL (the action behind
    * [[dupNgramStats]]'s fractions — Lee et al.'s "train on text with
    * the duplicated spans cut out"): a token is removed iff some `n`-gram
    * window containing it occurs in MORE THAN `maxDf` distinct documents
    * (cross-doc boilerplate; within-doc repetition alone never triggers).
    * Returns (idCol, n_tokens, n_kept, cleaned) with `cleaned` the
    * surviving tokens in original order ('' when everything was
    * boilerplate).
    *
    * Scale shape: one shuffle builds the n-gram document frequencies
    * (distinct (doc, gram) → count per gram); dup-gram starts come back
    * via a semi join on the gram; coverage expansion and the keep-filter
    * are per-document; the rebuild is one ordered aggregation keyed by
    * doc. The gram df relation is the only corpus-wide state.
    */
  def stripDupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDf: Int = 1): DataFrame = {
    require(n >= 1 && maxDf >= 1, s"need n >= 1, maxDf >= 1; got $n/$maxDf")
    val toks = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val grams = docs.select(col(idCol),
      posexplode(graft.functions.TextAnalysis.wordNGrams(col(textCol), n))
        .as(Seq("gpos", "gram")))
    val dupGrams = grams.select(col(idCol), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("gram"))
    val covered = grams.join(dupGrams, Seq("gram"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("cleaned"))
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** A count-min sketch: the (row, col, count) cell relation plus the
    * (depth, width) that SHAPED it — traveling together so an estimate
    * can never silently hash with mismatched settings (the
    * BandIndex/BloomIndex contract). Merge sketches of EQUAL shape by
    * unioning `cells` and re-summing `n` per (r, c).
    */
  final case class CmSketch(cells: DataFrame, depth: Int, width: Int)

  /** Count-min sketch over a key stream: depth md5-derived hash rows ×
    * `width` columns — counts merge by ADDITION (the sketch twin of
    * [[kmvDistinct]] for FREQUENCIES), state is depth×width integers
    * regardless of key cardinality. All integer arithmetic (md5 →
    * 60-bit long → mod width), so every engine builds the identical
    * relation.
    */
  def cmSketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): CmSketch = {
    require(depth >= 1 && width >= 1,
      s"need depth >= 1 and width >= 1, got $depth/$width")
    CmSketch(
      df.select(col(keyCol).as("k"),
          explode(sequence(lit(0), lit(depth - 1))).as("r"))
        .withColumn("c", cmCell(col("k"), col("r"), width))
        .groupBy(col("r"), col("c"))
        .agg(count(lit(1)).as("n")),
      depth, width)
  }

  private def cmCell(key: Column, row: Column, width: Int): Column =
    (conv(substring(md5(concat(row.cast("string"), lit(":"), key)), 1, 15),
      16, 10).cast("long") % width).cast("int")

  /** Point-estimate key frequencies from a sketch: min over the depth
    * rows of the key's counters (the count-min guarantee: estimate ≥
    * true count always; equality when no row collides). The sketch side
    * broadcasts — estimating is a scan of the key set. Hash shape comes
    * from the sketch itself.
    */
  def cmEstimate(sketch: CmSketch, keys: DataFrame, keyCol: String): DataFrame =
    keys.select(col(keyCol).as("k")).distinct()
      .withColumn("r", explode(sequence(lit(0), lit(sketch.depth - 1))))
      .withColumn("c", cmCell(col("k"), col("r"), sketch.width))
      .join(broadcast(sketch.cells), Seq("r", "c"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))

  /** Mergeable MISRA-GRIES heavy hitters — the deterministic top-item
    * summary completing the mergeable-summary family (count-min q132
    * OVERestimates any key; this UNDERestimates but is k-bounded and
    * self-contained: no second pass over the data to read an estimate).
    * The occurrence stream is split into `nSlices` deterministic slices
    * by the md5 of `sliceKey` (e.g. the doc id — the stand-in for "which
    * worker saw this occurrence", pinned to data not to partitioning so
    * every engine builds the identical summary); each slice reduces its
    * exact counts to an MG_k summary (keep the k largest counters,
    * subtract the (k+1)-th largest); summaries merge by adding counters
    * and reducing once more (Agarwal et al., Mergeable Summaries,
    * PODS'12 — the merged summary keeps the MG guarantee).
    *
    * Guarantees (spec-pinned): est ≤ true count for every emitted item;
    * true − est ≤ N/(k+1) for every item (emitted or not, reading a
    * missing item as 0); hence any item with true count > N/(k+1) is
    * PRESENT. Ties break deterministically by (count desc, item asc).
    *
    * Plan shape: one (slice, item) count shuffle, per-slice ranking
    * windows, then a FINAL reduce over the ≤ nSlices·k surviving
    * counters — summary-sized, so its global window is one small task
    * by construction, never a data-sized sort.
    */
  def heavyHitters(df: DataFrame, itemCol: String, sliceKey: Column,
      k: Int, nSlices: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nSlices >= 1, s"nSlices must be >= 1, got $nSlices")
    val slice = conv(substring(md5(sliceKey.cast("string")), 1, 15),
      16, 10).cast("long") % nSlices
    val counts = df.select(col(itemCol).as("item"), slice.as("slice"))
      .groupBy(col("slice"), col("item"))
      .agg(count(lit(1)).as("c"))
    val wRank = Window.partitionBy(col("slice"))
      .orderBy(col("c").desc, col("item").asc)
    val wSlice = Window.partitionBy(col("slice"))
    val reduced = counts
      .withColumn("rk", row_number().over(wRank))
      .withColumn("t",
        max(when(col("rk") === k + 1, col("c")).otherwise(lit(0L)))
          .over(wSlice))
      .filter(col("rk") <= k && col("c") - col("t") > 0)
      .select(col("item"), (col("c") - col("t")).as("c"))
    // merged counters: ≤ nSlices·k rows — the global window below runs
    // over a summary, not the data
    val merged = reduced.groupBy(col("item")).agg(sum(col("c")).as("c"))
    val wgRank = Window.orderBy(col("c").desc, col("item").asc)
    val wgAll = Window.partitionBy()
    merged
      .withColumn("rk", row_number().over(wgRank))
      .withColumn("t",
        max(when(col("rk") === k + 1, col("c")).otherwise(lit(0L)))
          .over(wgAll))
      .filter(col("rk") <= k && col("c") - col("t") > 0)
      .select(col("item"), (col("c") - col("t")).as("est_min"))
  }

  /** Good-Turing bigram count-of-counts per group — the frequency
    * spectrum an n-gram LM smoother (and an LM-perplexity quality
    * filter) is built from. For each group: `r` = a bigram's corpus
    * count, `n_r` = how many distinct bigrams occur exactly r times,
    * and the Good-Turing discounted count r* = (r+1)·N_{r+1}/N_r in
    * exact integer micro-units (0 where N_{r+1} is empty). Two keyed
    * shuffles (bigram counts, then spectrum), all-integer output.
    */
  def goodTuringBigrams(df: DataFrame, groupCol: String, textCol: String,
      maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"maxR must be >= 1, got $maxR")
    // O(len) bigram stream — wordNGrams' zip_with shape; the naive
    // transform(sequence)(element_at(split…)) form re-tokenizes per
    // element (its own doc comment warns it is O(len²))
    val bigrams = graft.functions.TextAnalysis.wordNGrams(col(textCol), 2)
    val counts = df.select(col(groupCol), explode(bigrams).as("bg"))
      .groupBy(col(groupCol), col("bg"))
      .agg(count(lit(1)).as("r"))
    val spectrum = counts.groupBy(col(groupCol), col("r"))
      .agg(count(lit(1)).as("n_r"))
    val next = spectrum.select(col(groupCol), (col("r") - 1).as("r"),
      col("n_r").as("n_r1"))
    spectrum.filter(col("r") <= maxR)
      .join(next, Seq(groupCol, "r"), "left")
      .select(col(groupCol), col("r"), col("n_r"),
        expr("(r + 1) * coalesce(n_r1, 0) * 1000000 DIV n_r")
          .as("r_star_micro"))
  }

  /** COLLOCATION mining — the word2vec phrase-detection score
    * (Mikolov et al. NeurIPS'13, §4: score(wᵢ,wⱼ) =
    * (c(wᵢwⱼ) − δ) / (c(wᵢ)·c(wⱼ)), scaled by corpus size): the
    * pre-tokenization pass that decides which adjacent word pairs
    * ("new york") merge into single tokens before training. The
    * discount δ kills rare-pair noise; scaling by total tokens T makes
    * the score a LIFT (≈ p(xy)/(p(x)p(y)), > 10⁶ micro ⇔ the pair
    * co-occurs more than independence predicts).
    *
    * All-integer: score_micro = ((c_xy − δ)·10⁶ div c_x)·T div c_y —
    * two floor divisions IN THIS ORDER (documented contract; the first
    * quotient is ≤ 10⁶ since c_xy ≤ c_x, so the second product is
    * ≤ 10⁶·T, far inside Long at any corpus size — one division would
    * overflow at c_xy·T·10⁶). The oracle mirrors the same two-step
    * floor, so engines agree bit-for-bit.
    *
    * Plan shape: one token-stream shuffle for unigram counts, one for
    * bigram counts, two equi-joins of the (vocab-bounded) count
    * relations, and a global top-k (TakeOrderedAndProject — never a
    * full sort). Scan-linear; the corpus text never shuffles.
    *
    * @param minCount the discount δ; pairs with c_xy ≤ δ drop
    * @param topK     result rows, ordered by (score desc, pair asc) —
    *                 a total order, so the cut is deterministic
    * @return (pair, c_xy, c_x, c_y, score_micro)
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tok = df.select(
      explode(split(col(textCol), " ")).as("w"))
    val cu = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    // one-row token total rides in as the established single-row
    // stats broadcast (the q47/BM25 shape; BNLJ-budgeted in PlanSpec)
    val total = tok.agg(count(lit(1)).as("t_total"))
    val cb = df.select(
        explode(graft.functions.TextAnalysis.wordNGrams(col(textCol), 2))
          .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") > minCount)
    cb.withColumn("w1", split(col("pair"), " ").getItem(0))
      .withColumn("w2", split(col("pair"), " ").getItem(1))
      .join(cu.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(cu.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("score_micro",
        expr(s"((c_xy - ${minCount}L) * 1000000L div c_x) * t_total div c_y"))
      .select(col("pair"), col("c_xy"), col("c_x"), col("c_y"),
        col("score_micro"))
      .orderBy(col("score_micro").desc, col("pair").asc)
      .limit(topK)
  }

  /** T5-style SPAN-CORRUPTION example construction (Raffel et al.
    * JMLR 2020 §3.1.4): turn each document into a denoising training
    * pair — the input with masked spans replaced by numbered sentinels,
    * and the target spelling out each sentinel's hidden tokens:
    * {{{
    *   text   = "the quick brown fox jumps"
    *   input  = "the <extra_id_0> jumps"
    *   target = "<extra_id_0> quick brown fox"
    * }}}
    * Span STARTS are md5-deterministic per (doc, position)
    * (`startPct`% of positions — reproducible across engines and
    * partitionings, the [[md5Bucket]] discipline, NOT rand()); each
    * start masks `spanLen` consecutive tokens; overlapping or adjacent
    * masks merge into one span (island detection), exactly like the
    * paper's corruption with mean span length ≈ spanLen.
    *
    * Plan shape: one posexplode of the token stream, ONE ordered
    * window pass per doc (frame max for mask spread, lag for island
    * starts, running sum for span numbering — all share the same
    * (doc, pos) sort), and one keyed aggregation that reassembles both
    * texts via sorted struct collect. Per-doc state only; nothing
    * corpus-global.
    *
    * @return (doc_id, input_text, target_text, n_spans, masked_tokens)
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      startPct: Int = 10, spanLen: Int = 3): DataFrame = {
    require(startPct >= 1 && startPct <= 100,
      s"startPct must be in [1, 100], got $startPct")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tokn")))
    val start = (conv(substring(md5(concat(lit("span:"),
      col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))),
      1, 15), 16, 10).cast("long") % 100L) < startPct
    val wSpread = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(spanLen - 1), 0)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val flagged = tok
      .withColumn("s", start.cast("int"))
      .withColumn("m", max(col("s")).over(wSpread) === 1)
      .withColumn("new_span",
        (col("m") && !coalesce(lag(col("m"), 1).over(wOrd), lit(false)))
          .cast("int"))
      .withColumn("span_id", sum(col("new_span")).over(wOrd))
    val sentinel = concat(lit("<extra_id_"),
      (col("span_id") - 1).cast("string"), lit(">"))
    val pieces = flagged.select(col("doc_id"), col("pos"), col("m"),
      col("span_id"),
      when(!col("m"), col("tokn"))
        .when(col("new_span") === 1, sentinel).as("in_piece"),
      when(col("m") && col("new_span") === 1,
          concat(sentinel, lit(" "), col("tokn")))
        .when(col("m"), col("tokn")).as("tgt_piece"))
    def joined(piece: String) = array_join(
      transform(
        filter(array_sort(collect_list(struct(col("pos"), col(piece)))),
          x => x.getField(piece).isNotNull),
        x => x.getField(piece)), " ")
    pieces.groupBy(col("doc_id"))
      .agg(joined("in_piece").as("input_text"),
        joined("tgt_piece").as("target_text"),
        max(col("span_id")).cast("long").as("n_spans"),
        sum(col("m").cast("long")).as("masked_tokens"))
  }

  /** Interpolated KNESER-NEY smoothed bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999 — the smoothing family behind the KenLM
    * models CCNet-style quality filtering scores with). For each
    * observed bigram (w₁ w₂):
    *
    *   P_KN(w₂|w₁) = max(c(w₁w₂) − d, 0)/c(w₁·)
    *               + d·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * with discount d = 3/4 and the characteristic CONTINUATION counts:
    * N₁₊(w₁·) = distinct continuations of w₁ (how much mass w₁ lends
    * to backoff), N₁₊(·w₂) = distinct predecessors of w₂ (how "novel-
    * context-friendly" w₂ is — the insight that "Francisco" is frequent
    * but only ever follows "San"), N₁₊(··) = distinct bigram types.
    *
    * Integer discipline: multiply through by 4 (d = 3/4 exact), micro
    * units, TWO floor divisions in documented order:
    * {{{
    *   cont_micro = (N₁₊(·w₂) · 10⁶) div N₁₊(··)
    *   p_micro    = (max(4·c_xy − 3, 0) · 10⁶) div (4·c_x)
    *              + (3 · N₁₊(w₁·) · cont_micro) div (4·c_x)
    * }}}
    * Both terms bounded: first ≤ 10⁶; second ≤ 3·10⁶·N₁₊(w₁·)/(4·c_x)
    * ≤ 10⁶ (N₁₊ ≤ c); products ≤ 3·10⁶·c far inside Long. The mirror
    * replays the identical floors, so engines agree bit-for-bit.
    *
    * Plan shape: one bigram-stream explode (scan), one count shuffle
    * keyed by bigram, then THREE re-aggregations of the vocab²-bounded
    * bigram-type relation (prefix counts+continuations, predecessor
    * counts, one scalar type total as the single-row stats broadcast),
    * two equi-joins back on w₁/w₂, and a total-order top-k cut
    * (TakeOrderedAndProject). Corpus text never shuffles; nothing is
    * corpus-quadratic.
    *
    * @param minCount only bigrams with c_xy ≥ minCount are REPORTED
    *                 (the model's counts still use every bigram)
    * @param topK     rows, by (p_micro desc, pair asc) — total order
    * @return (pair, c_xy, c_prefix, n_cont, cont_micro, p_micro)
    */
  def kneserNeyBigrams(docs: DataFrame, textCol: String,
      minCount: Long = 3, topK: Int = 300): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val bg = docs.select(explode(
        graft.functions.TextAnalysis.wordNGrams(col(textCol), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_xy"))
      .withColumn("w1", split(col("pair"), " ").getItem(0))
      .withColumn("w2", split(col("pair"), " ").getItem(1))
    // prefix mass + distinct continuations per w1 — one pass over the
    // bigram-TYPE relation (vocab-bounded, not corpus-bounded)
    val pre = bg.groupBy(col("w1"))
      .agg(sum(col("c_xy")).as("c_prefix"),
        count(lit(1)).as("n_cont"))
    // distinct predecessors per w2, and the single-row type total
    val succ = bg.groupBy(col("w2")).agg(count(lit(1)).as("n_pred"))
    val types = bg.agg(count(lit(1)).as("n_types"))
    bg.join(pre, Seq("w1"))
      .join(succ, Seq("w2"))
      .crossJoin(broadcast(types)) // single-row stats broadcast (q47 shape)
      .filter(col("c_xy") >= minCount)
      .withColumn("cont_micro",
        expr("(n_pred * 1000000L) div n_types"))
      .withColumn("p_micro",
        expr("(greatest(4L * c_xy - 3L, 0L) * 1000000L) div (4L * c_prefix)" +
          " + (3L * n_cont * cont_micro) div (4L * c_prefix)"))
      .select(col("pair"), col("c_xy"), col("c_prefix"), col("n_cont"),
        col("cont_micro"), col("p_micro"))
      .orderBy(col("p_micro").desc, col("pair").asc)
      .limit(topK)
  }

  /** Per-document BIGRAM SURPRISAL — the model-based quality-filter
    * signal (the KenLM/CCNet perplexity-filtering idea, reduced to a
    * bigram LM and integer arithmetic): train bigram counts on the
    * corpus, score each document by its mean per-bigram surprisal
    * −log₂ p(w₂ | w₁) with p = c(w₁w₂) / c(w₁·). An unusual
    * word-to-word transition costs many bits; boilerplate costs few —
    * so a HIGH mean flags rare/garbled text and a LOW mean flags
    * repetitive boilerplate, the two tails a perplexity filter cuts.
    *
    * The log is the FLOOR-log₂ both engines compute identically as the
    * binary-string length (`length(bin(x))` = ⌊log₂ x⌋ + 1 for x ≥ 1 —
    * the logHistSketch idiom), so
    * `bits = length(bin(c_prev)) − length(bin(c_bigram))` approximates
    * log₂(c_prev/c_big) within ±1 bit with NO transcendentals: the
    * whole score is integer-exact and engine-reproducible (ln/log2 on
    * doubles differ in ulps across libms; bin() cannot).
    *
    * c_prev counts w₁ as a bigram PREFIX (= Σ over bigrams starting
    * with w₁), so p sums to 1 per prefix and bits ≥ 0.
    *
    * Plan shape: one explode of the bigram stream (scan), one count
    * shuffle keyed by bigram, a prefix re-aggregation of the
    * (vocabulary²-bounded) count relation, and one join of per-doc
    * bigrams to the counts on the bigram key — scan-linear in the
    * corpus, never quadratic. Documents with < 2 tokens have no
    * bigrams and are absent from the output (undefined perplexity).
    *
    * @return (doc_id, n_bigrams, sum_bits, mean_bits_micro) with
    *         mean_bits_micro = (sum_bits · 10⁶) div n_bigrams
    */
  def bigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextAnalysis.wordNGrams(col(textCol), 2))
        .as("g"))
    val cb = bg.groupBy(col("g")).agg(count(lit(1)).as("cg"))
    val cp = cb
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("cg")).as("cw"))
    bg.join(cb, Seq("g"))
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .join(cp, Seq("w1"))
      .withColumn("bits",
        (length(bin(col("cw"))) - length(bin(col("cg")))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .withColumn("mean_bits_micro",
        expr("(sum_bits * 1000000L) div n_bigrams"))
  }

  /** Bucket counts per group: bucket = length of the value's binary
    * form (= ⌊log2 x⌋ + 1 for x ≥ 1; 0 and 1 share bucket 1). Merge
    * sketches by unioning and re-summing `n` per (group, bucket).
    * Values must be NON-NEGATIVE (enforced): bin() of a negative long
    * is its 64-char two's-complement form, which would order after
    * every positive bucket and alias its ceiling to 2⁶⁴ − 1 — silently
    * wrong quantiles rather than an error.
    */
  def logHistSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    // the assert lives INSIDE the bucket expression (assert_true is null
    // on pass, throws on fail) so column pruning can never elide it
    val bucket = when(
      assert_true(col(valueCol) >= 0,
        concat(lit(s"logHistSketch: negative $valueCol: "),
          col(valueCol).cast("string"))).isNull,
      length(bin(col(valueCol))).cast("int"))
    df.select(groupCols.map(col) :+ bucket.as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from a sketch. Each requested quantile is a
    * RATIONAL (name, num, den) so the target rank
    * ⌈(num/den)·N⌉ = (num·N + den − 1) DIV den stays in integers; the
    * estimate is the ceiling value 2^bucket − 1 of the first bucket
    * whose cumulative count reaches the rank. Output: one row per
    * group, (groupCols..., n_rows, <name>_est...).
    */
  def logHistQuantiles(sketch: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    quantiles.foreach { case (name, num, den) =>
      require(num >= 1 && num <= den,
        s"quantile $name: need 1 <= num <= den, got $num/$den")
    }
    val gcols = groupCols.map(col)
    val wc = Window.partitionBy(gcols: _*).orderBy(col("bucket"))
    val wt = Window.partitionBy(gcols: _*)
    val est = sketch
      .withColumn("cum", sum(col("n")).over(wc))
      .withColumn("total", sum(col("n")).over(wt))
      .withColumn("est",
        expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1"))
    val aggs = max(col("total")).as("n_rows") +: quantiles.map {
      case (name, num, den) =>
        min(when(col("cum") >=
            expr(s"($num * total + ${den - 1}) DIV $den"), col("est")))
          .as(s"${name}_est")
    }
    est.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** EXACT linear-interpolated quantiles per group — the precise
    * companion to [[logHistQuantiles]]'s sketch estimates, in pure
    * integer arithmetic so both engines agree bit-for-bit. For
    * quantile p (basis points) over n sorted values v₁..vₙ, the
    * standard percentile_cont position is (n−1)·p/10⁴; split it
    * exactly as lo = (n−1)·p DIV 10⁴ and frac = (n−1)·p MOD 10⁴,
    * then
    *
    *   q_micro = v_{lo+1} · 10⁶ + (v_{lo+2} − v_{lo+1}) · frac · 100
    *
    * (v_{lo+2} clamped to vₙ) — percentile_cont with the interpolation
    * carried in micro units instead of an IEEE multiply. Needs
    * |v| < 9.2·10¹² (the cents discipline).
    *
    * One ranking window per group plus one broadcast of the (name, bp)
    * literal list; each group contributes ≤ 2 rows per quantile to the
    * final aggregation.
    *
    * @return one row per group × quantile: (group…, q_name, q_micro)
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String],
      valCol: String, quantilesBp: Seq[(String, Int)]): DataFrame = {
    quantilesBp.foreach { case (name, bp) =>
      require(bp >= 0 && bp <= 10000,
        s"quantile $name: bp must be in [0, 10000], got $bp")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val gcols = groupCols.map(col)
    val wp = Window.partitionBy(gcols: _*)
    val ranked = df
      .withColumn("__v", col(valCol).cast("long"))
      .withColumn("__rn", row_number().over(wp.orderBy(col("__v").asc)))
      .withColumn("__n", count(lit(1)).over(wp))
    val qs = broadcast(quantilesBp.toDF("q_name", "__bp"))
    val pos = ranked.crossJoin(qs)
      .withColumn("__lo", expr("((__n - 1) * __bp) div 10000"))
      .withColumn("__frac", expr("((__n - 1) * __bp) % 10000"))
      .filter(col("__rn") === col("__lo") + 1 ||
        col("__rn") === least(col("__lo") + 2, col("__n")))
    pos.groupBy((gcols :+ col("q_name")): _*)
      .agg((max(when(col("__rn") === col("__lo") + 1, col("__v")))
          * lit(1000000L) +
        (coalesce(
            max(when(col("__rn") === col("__lo") + 2, col("__v"))),
            max(when(col("__rn") === col("__lo") + 1, col("__v"))))
          - max(when(col("__rn") === col("__lo") + 1, col("__v"))))
          * max(col("__frac")) * lit(100L))
        .as("q_micro"))
  }

  /** Integer rank-percentile FEATURES per group — the rank-based
    * normalization step (percent_rank / decile binning) a feature
    * pipeline applies before training, in exact integer form:
    * pct_micro = (rn−1)·10⁶ DIV (n−1) (0 for singleton groups) and
    * decile = (rn−1)·10 DIV n, with rn ranked by (value, tiebreak…)
    * — a TOTAL order, so ties get deterministic distinct ranks and
    * both engines assign identical features. One shuffle on the group
    * key.
    */
  def rankFeatures(df: DataFrame, groupCols: Seq[String], valCol: String,
      tiebreak: Seq[String]): DataFrame = {
    val wp = Window.partitionBy(groupCols.map(col): _*)
    val order = (valCol +: tiebreak).map(c => col(c).asc)
    df.withColumn("rn", row_number().over(wp.orderBy(order: _*)))
      .withColumn("n_rows", count(lit(1)).over(wp))
      .withColumn("pct_micro",
        when(col("n_rows") === 1L, lit(0L)).otherwise(
          expr("CAST((rn - 1) AS BIGINT) * 1000000 div (n_rows - 1)")))
      .withColumn("decile",
        expr("(CAST((rn - 1) AS BIGINT) * 10) div n_rows"))
  }

  // ------------------------------------------------------------------
  // HyperLogLog registers (Flajolet et al. 2007) — the industry-standard
  // mergeable distinct-count sketch, here as a plain (group, bucket,
  // r) relation: m = 64 registers per group, register = max leading-run
  // length. Merge = per-bucket MAX (associative/idempotent), so
  // per-partition partial sketches union into the corpus sketch with no
  // second data pass — the property that makes it the 100 TB shape.
  // ------------------------------------------------------------------

  /** Register count: fixed m = 64 (p = 6 bucket bits). Plenty for the
    * catalog's per-group estimates (±1.04/√64 ≈ 13% standard error) and
    * keeps the register relation trivially broadcastable.
    */
  val HllM = 64

  /** HLL register relation for the distinct values of `itemCol` per
    * group: h = 60-bit md5 integer; bucket = h mod 64; r = position of
    * the highest set bit in the remaining 54 bits counted from the top
    * = 55 − bitlen(h div 64) (an all-zero remainder maps to 54 — the
    * bin('0') = '0' convention both engines share; the ideal-HLL 55 is
    * unreachable and irrelevant at any real cardinality). Only occupied
    * buckets appear; [[hllEstimate]] supplies the 2⁰ mass of absent
    * ones.
    * @return (groupCols..., bucket, r)
    */
  def hllSketch(df: DataFrame, groupCols: Seq[String], itemCol: String,
      seedTag: String = "hll:"): DataFrame = {
    val h = conv(substring(md5(concat(lit(seedTag), col(itemCol))), 1, 15),
      16, 10).cast("long")
    val gcols = groupCols.map(col)
    df.select(gcols :+ h.as("h"): _*)
      .select(gcols :+ pmod(col("h"), lit(HllM.toLong)).cast("int").as("bucket")
        :+ (lit(55) - length(bin(expr(s"h div $HllM")))).cast("int").as("r"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Merge register relations (possibly re-grouped): per-bucket MAX. */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Raw HLL estimate per group: E = α₆₄·m² / Σⱼ 2^(−Mⱼ) with
    * Σ 2^(−Mⱼ) scaled by 2⁵⁵ into an exact BIGINT (register terms
    * shiftleft(1, 55 − r); absent buckets contribute 2⁵⁵ each), then
    * ONE IEEE divide + floor — engine-identical. α₆₄·m²·2⁵⁵ is a
    * precomputed double literal. Raw estimator only (no linear-counting
    * small-range correction — that needs ln(); callers counting
    * n ≲ 2.5·m distinct items should read n from an exact count
    * instead). Standard error ≈ 13% at m = 64.
    * @return (groupCols..., hll_buckets, hll_est)
    */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String]): DataFrame = {
    // 0.709 * 64² * 2⁵⁵ rendered once; double literal round-trips
    val c = 0.709 * HllM * HllM * math.pow(2, 55)
    val gcols = groupCols.map(col)
    sketch.groupBy(gcols: _*)
      .agg(count(lit(1)).as("hll_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - r)")).as("s_occ"))
      .withColumn("s_all",
        col("s_occ") +
          (lit(HllM.toLong) - col("hll_buckets")) * lit(1L << 55))
      .select(gcols :+ col("hll_buckets")
        :+ floor(lit(c) / col("s_all").cast("double")).cast("long")
          .as("hll_est"): _*)
  }

  // ------------------------------------------------------------------
  // DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
  // score every document by how much more likely its hashed-token
  // stream is under a TARGET distribution than under the RAW one —
  // the data-selection signal for matching a pretraining mix to a
  // high-quality target domain.
  // ------------------------------------------------------------------

  /** Hashed-unigram token stream: (doc_id, b) with
    * b = md5("dsir:" ‖ token) mod nBuckets, WITH multiplicity — the
    * feature extraction both the count pass and the score pass share.
    */
  private def dsirTokenBuckets(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int,
      extra: Seq[(String, Column)] = Nil): DataFrame =
    docs.select(col(idCol).as("doc_id") +:
        extra.map { case (n, c) => c.as(n) } :+
        explode(split(col(textCol), " ")).as("wd"): _*)
      .withColumn("b", pmod(
        conv(substring(md5(concat(lit("dsir:"), col("wd"))), 1, 15), 16, 10)
          .cast("long"), lit(nBuckets.toLong)))
      .drop("wd")

  /** Per-bucket DSIR log-ratio weights, computed ON THE DRIVER from the
    * bucket-count relation (≤ nBuckets rows — the same bounded-collect
    * contract as IVF centroid training):
    *   bits_micro(b) = round(10⁶ · log₂(p̂_tgt(b) / p̂_raw(b)))
    * with add-one smoothing on both sides. Logs use [[StrictMath]]
    * (fdlibm, bit-identical on every JVM); determinism across ENGINES is
    * by construction — the weights are literals that both the Spark plan
    * and the DuckDB mirror consume (the trained-centroid pattern), never
    * recomputed in either engine's math library.
    * @return (bucket, bits_micro) sorted by bucket
    */
  def dsirBucketWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 1024): Seq[(Long, Long)] = {
    require(nBuckets >= 2, s"dsirWeights: nBuckets must be >= 2, got $nBuckets")
    val counts = dsirTokenBuckets(docs, idCol, textCol, nBuckets,
        extra = Seq("tgt" -> isTarget))
      .groupBy(col("b")).agg(
        (sum(when(col("tgt"), 1L).otherwise(0L)) + 1L).as("ct"),
        (sum(when(col("tgt"), 0L).otherwise(1L)) + 1L).as("cr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val tt = counts.map(_._2).sum.toDouble
    val tr = counts.map(_._3).sum.toDouble
    val ln2 = StrictMath.log(2.0)
    counts.toSeq.map { case (b, ct, cr) =>
      val w = (StrictMath.log(ct / tt) - StrictMath.log(cr / tr)) / ln2
      (b, Math.round(w * 1e6))
    }
  }

  /** DSIR importance scores (Xie et al. 2023, arXiv:2302.03169): every
    * document scored by the log-likelihood ratio of its hashed-unigram
    * stream under the TARGET vs the RAW distribution — the
    * data-selection signal for matching a pretraining mix to a quality
    * domain. Per-doc score = Σ bits_micro(b) over the token stream
    * (positive = target-like), using [[dsirBucketWeights]]'s
    * driver-computed literal weight table (broadcast; the corpus
    * shuffles only for its own per-doc aggregate).
    *
    * mean_bits_micro divides with `div`: the sum can be NEGATIVE
    * (raw-like docs), and both engines truncate integer division
    * toward zero (Spark `div`, DuckDB `//` — verified on negative
    * operands), so the quotient matches bit-for-bit.
    *
    * @param isTarget row predicate choosing the target subset; all rows
    *                 (target included) are scored
    * @return (doc_id, n_feats, sum_bits_micro, mean_bits_micro)
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 1024): DataFrame = {
    val wts = dsirBucketWeights(docs, idCol, textCol, isTarget, nBuckets)
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = wts.toDF("b", "bits_micro")
    dsirTokenBuckets(docs, idCol, textCol, nBuckets)
      .join(broadcast(wdf), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("bits_micro")).as("sum_bits_micro"))
      .withColumn("mean_bits_micro",
        expr("sum_bits_micro div n_feats"))
  }
}
