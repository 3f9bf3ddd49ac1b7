package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hashed multinomial Naive Bayes — the quality/language classifier a
  * curation pipeline runs over every document (the CCNet/fastText role,
  * reduced to engine-native relational form). Extension surface: the
  * reference has no classifiers.
  *
  * The hashing trick (Weinberger et al., ICML'09) makes the model
  * BOUNDED: tokens hash into a fixed bucket count, so the fitted model
  * is classes × buckets counts — collectable to the driver no matter
  * the corpus size, exactly like the BM25 queried-term idf relation.
  * The TRAIN pass is one keyed aggregation of exact integer counts; the
  * driver turns counts into micro-quantized [[StrictMath]] log-
  * likelihoods (fdlibm — bit-identical on every JVM, the
  * [[Retrieval.bm25LogIdf]] pattern); SCORING is then an exact integer
  * dot product of per-doc bucket counts with broadcast literals that
  * any engine replays bit-for-bit. Neither engine ever runs its own
  * `ln`.
  */
object Classify {

  /** A fitted model: per-class micro log-prior and the classes×buckets
    * micro log-likelihood table (Laplace +1 smoothing over buckets).
    */
  final case class NbModel(labels: Seq[String], nBuckets: Int,
      priorMicro: Map[String, Long],
      likeMicro: Seq[(String, Long, Long)]) // (label, bucket, lp_micro)

  /** Stable token → bucket: leading 15 hex digits of
    * md5("nb:" ‖ token) mod nBuckets — the same engine-portable hash
    * family as the DSIR features and the drift monitor (a DuckDB
    * mirror reproduces it from the md5 hex string).
    */
  def tokenBucket(token: Column, nBuckets: Int): Column =
    taggedTokenBucket("nb:", token, nBuckets)

  /** [[tokenBucket]] under a caller-chosen hash-family tag, so two
    * models over the same corpus (the NB classifier, the quality
    * distiller) draw INDEPENDENT hash families from the same
    * engine-portable md5 idiom.
    */
  def taggedTokenBucket(tag: String, token: Column,
      nBuckets: Int): Column =
    conv(substring(md5(concat(lit(tag), token)), 1, 15), 16, 10)
      .cast("long") % nBuckets.toLong

  private def bucketCounts(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket", tokenBucket(col("tok"), nBuckets))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Fit on labelled documents. The collect is classes × nBuckets rows
    * (+ one per class) — model-sized, not data-sized.
    *
    *   prior(c) = ln(docs_c / docs_total)
    *   lp(c, b) = ln((tok_{c,b} + 1) / (tok_c + nBuckets))
    *
    * both micro-rounded.
    */
  def fitHashedNb(train: DataFrame, textCol: String, labelCol: String,
      nBuckets: Int = 64): NbModel = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val byClass = train
      .select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket", tokenBucket(col("tok"), nBuckets))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docCounts = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docCounts.values.sum
    val labels = docCounts.keys.toSeq.sorted
    val tokTotals = byClass.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val counts = byClass.map { case (l, b, c) => (l, b) -> c }.toMap
    val like = for {
      l <- labels
      b <- 0L until nBuckets.toLong
    } yield {
      val c = counts.getOrElse((l, b), 0L)
      val lp = StrictMath.log(
        (c + 1.0) / (tokTotals.getOrElse(l, 0L) + nBuckets.toDouble))
      (l, b, Math.round(lp * 1e6))
    }
    val prior = labels.map { l =>
      l -> Math.round(StrictMath.log(docCounts(l).toDouble / total) * 1e6)
    }.toMap
    NbModel(labels, nBuckets, prior, like)
  }

  /** Score documents: per (doc, class),
    * score = prior_micro(c) + Σ_b cnt(doc,b) · lp_micro(c,b) — exact
    * BIGINT; prediction = argmax, ties broken by label asc. The model
    * joins in as a BROADCAST literal relation; one shuffle keyed on the
    * doc id.
    *
    * @return (idCol, pred_label, score_micro)
    */
  /** Per-group ROC AUC of a scored binary classifier, as the
    * Mann-Whitney U statistic (Hanley & McNeil 1982: AUC = P(random
    * positive outranks random negative), ties count ½) in EXACT integer
    * micro units — the eval every quality/language filter needs before
    * its threshold is trusted.
    *
    * Arithmetic: per distinct score (ascending), with `neg_below` the
    * negatives at strictly smaller scores and `neg_at` the tied ones,
    * {{{
    *   2U  = Σ p_at · (2·neg_below + neg_at)        — exact, ≤ 2·P·N
    *   auc = 2U / (2·P·N)
    * }}}
    * rendered in micros by TWO chained milli scalings —
    * `(2U·10³ div d)·10³ + ((2U·10³ mod d)·10³) div d`, d = 2·P·N —
    * so the largest intermediate is d·10³ = 2·P·N·10³: exact while
    * 2·P·N ≤ Long.MaxValue/10³, i.e. P·N ≤ ~4.6·10¹⁵ (P, N per group
    * up to ~6.7·10⁷ — a group needing more judged eval rows than that
    * should subsample first; a single 10⁶ multiply would already
    * overflow at P·N > 4.6·10¹²). Beyond the envelope `auc_micro` is
    * NULL, never silently wrong — the same guard is in the SQL mirror,
    * so both engines agree bit-for-bit inside and outside it. Both
    * floors are part of the operator contract; the mirror replays them
    * bit-for-bit.
    *
    * Plan shape: one keyed aggregation to the per-(group, score) count
    * relation (score-cardinality-bounded, not row-bounded), one
    * running-sum window over it, one keyed re-aggregation. The scored
    * rows themselves shuffle once.
    *
    * @param labelCol 1/true = positive, 0/false = negative
    * @return per group: (n_pos, n_neg, auc_micro) — auc_micro NULL
    *         when a group has no positives or no negatives (AUC
    *         undefined, not 0), or when 2·P·N exceeds the exactness
    *         envelope Long.MaxValue/10³ (overflow would be silent)
    */
  def rocAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val g = df
      .groupBy(gc :+ col(scoreCol).cast("long").as("score"): _*)
      .agg(count(lit(1)).as("n_at"),
        sum(col(labelCol).cast("long")).as("p_at"))
      .withColumn("neg_at", col("n_at") - col("p_at"))
    val w = Window.partitionBy(gc: _*).orderBy(col("score").asc)
    g.withColumn("cum_neg", sum(col("neg_at")).over(w))
      .groupBy(gc: _*)
      .agg(sum(col("p_at")).as("n_pos"),
        sum(col("neg_at")).as("n_neg"),
        sum(col("p_at") * (lit(2L) * (col("cum_neg") - col("neg_at"))
          + col("neg_at"))).as("u2"))
      .withColumn("auc_micro",
        // envelope check WITHOUT multiplying: 2·P·N ≤ maxLong/10³ ⇔
        // P ≤ (maxLong/10³/2) div N for P,N ≥ 1 — the product form
        // wraps under non-ANSI Spark beyond ~4.6e18 (guard could pass
        // falsely) and raises in DuckDB (engines diverge); the division
        // form cannot overflow and both engines agree bit-for-bit
        when(col("n_pos") > 0L && col("n_neg") > 0L
            && col("n_pos") <= expr(
              s"${Long.MaxValue / 1000L / 2L}L div greatest(n_neg, 1L)"),
          expr(
          "((u2 * 1000L) div (2L * n_pos * n_neg)) * 1000L" +
            " + (((u2 * 1000L) % (2L * n_pos * n_neg)) * 1000L)" +
            " div (2L * n_pos * n_neg)")))
      .select(gc :+ col("n_pos") :+ col("n_neg") :+ col("auc_micro"): _*)
  }

  /** Per-group PRECISION/RECALL/F1 sweep over every observed score
    * threshold — the operating-point picker that turns [[rocAuc]]'s
    * threshold-free grade into an actual filter cut. For each distinct
    * score s (predict positive ⇔ score ≥ s):
    * {{{
    *   tp(s) = positives with score ≥ s     pp(s) = rows with score ≥ s
    *   precision = tp/pp   recall = tp/P    f1 = 2PR/(P+R)
    * }}}
    * all in exact integer micros (divisions floored, f1 from the
    * already-floored micro P and R — documented order). One descending
    * cumulative window over the per-(group, score) count relation —
    * score-cardinality-bounded, like [[rocAuc]].
    *
    * @return (group…, threshold, tp, pp, n_pos, precision_micro,
    *         recall_micro, f1_micro) — one row per observed score;
    *         recall/f1 NULL when the group has no positives
    */
  def prCurve(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val g = df
      .groupBy(gc :+ col(scoreCol).cast("long").as("threshold"): _*)
      .agg(count(lit(1)).as("n_at"),
        sum(col(labelCol).cast("long")).as("p_at"))
    val w = Window.partitionBy(gc: _*).orderBy(col("threshold").desc)
    val tot = Window.partitionBy(gc: _*)
    g.withColumn("tp", sum(col("p_at")).over(w))
      .withColumn("pp", sum(col("n_at")).over(w))
      .withColumn("n_pos", sum(col("p_at")).over(tot))
      .withColumn("precision_micro", expr("(tp * 1000000L) div pp"))
      .withColumn("recall_micro",
        when(col("n_pos") > 0L, expr("(tp * 1000000L) div n_pos")))
      .withColumn("f1_micro",
        when(col("n_pos") > 0L && col("precision_micro") + col("recall_micro") > 0L,
          expr("(2L * precision_micro * recall_micro)" +
            " div (precision_micro + recall_micro)"))
          .otherwise(when(col("n_pos") > 0L, lit(0L))))
      .select(gc ++ Seq(col("threshold"), col("tp"), col("pp"),
        col("n_pos"), col("precision_micro"), col("recall_micro"),
        col("f1_micro")): _*)
  }

  /** Per-group RELIABILITY DIAGRAM (calibration bins) + expected
    * calibration error contributions — the eval that tells you whether
    * a classifier's confidence MEANS anything before you threshold it
    * (Guo et al., ICML'17 reduced to exact integers): scores already in
    * micros [0, 1e6] land in `nBins` equal-width confidence bins; per
    * (group, bin) the mean claimed confidence and the observed positive
    * rate are floored micro divisions, and their absolute gap weighted
    * by the bin count is the bin's ECE contribution. ECE itself is
    * Σ gap·n / N — one more floored division the caller (or the oracle)
    * applies over the bounded bin relation. One keyed aggregation;
    * bin-cardinality-bounded output (≤ groups × nBins rows).
    *
    * @param df       (group…, scoreCol in [0, 1e6], labelCol 0/1)
    * @return (group…, bin, n, conf_micro, acc_micro, gap_micro)
    */
  def calibrationBins(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"calibrationBins: nBins must be >= 1, got $nBins")
    val gc = groupCols.map(col)
    df
      .withColumn("__bin", expr(
        s"least((CAST($scoreCol AS BIGINT) * ${nBins}L) div 1000000L, " +
          s"${nBins - 1}L)"))
      .groupBy(gc :+ col("__bin").as("bin"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(scoreCol).cast("long")).as("__sum_score"),
        sum(col(labelCol).cast("long")).as("__sum_pos"))
      .withColumn("conf_micro", expr("__sum_score div n"))
      .withColumn("acc_micro", expr("(__sum_pos * 1000000L) div n"))
      .withColumn("gap_micro", abs(col("conf_micro") - col("acc_micro")))
      .select(gc ++ Seq(col("bin"), col("n"), col("conf_micro"),
        col("acc_micro"), col("gap_micro")): _*)
  }

  def scoreHashedNb(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val likeDf = model.likeMicro.toDF("label", "bucket", "lp_micro")
    val priorDf = model.priorMicro.toSeq.sorted
      .toDF("label", "prior_micro")
    val scored = bucketCounts(docs, idCol, textCol, model.nBuckets)
      .join(broadcast(likeDf), Seq("bucket"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("cnt") * col("lp_micro")).as("ll_micro"))
      .join(broadcast(priorDf), Seq("label"))
      .withColumn("score_micro", col("prior_micro") + col("ll_micro"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("label").as("pred_label"),
        col("score_micro"))
  }

  /** Per-document features for the DISTILLED quality filter (the
    * GPT-3 Appendix A / FineWeb-edu recipe shape: an expensive
    * teacher signal is distilled into a cheap linear proxy that then
    * gates the whole corpus). One pass emits BOTH sides:
    *
    *  - `y_micro` — the TEACHER: unique-token ratio in exact integer
    *    micros (floor), the repetition/quality signal an expensive
    *    scorer would stand in for (in production: an LLM judge's
    *    grade; the relational distillation mechanics are identical).
    *  - `n_tokens` + `f0..f{nBuckets-1}` — the PROXY features: total
    *    token count and hashed-unigram bucket counts (the Weinberger
    *    hashing trick under its own `qf:` hash family), all exact
    *    BIGINTs a [[Regression.fitRidge]] consumes directly.
    *
    * Scale shape: explode → ONE keyed aggregation (the distinct
    * count plans as a two-phase Expand, still map-side partial);
    * output is one row per document, scan-linear, no joins. The
    * bucket columns pivot via conditional sums over the SAME rows —
    * never one aggregation per bucket.
    */
  def distillQualityFeatures(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 8): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64,
      s"nBuckets must be in [2, 64], got $nBuckets")
    val tok = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket", taggedTokenBucket("qf:", col("tok"), nBuckets))
    val fCols = (0 until nBuckets).map(j =>
      sum(when(col("bucket") === j.toLong, 1L).otherwise(0L))
        .as(s"f$j"))
    tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (Seq(count_distinct(col("tok")).as("n_uniq")) ++ fCols): _*)
      .withColumn("y_micro", expr("(n_uniq * 1000000L) div n_tokens"))
      .drop("n_uniq")
  }
}
