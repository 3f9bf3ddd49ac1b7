package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: the type-2 slowly-changing-dimension
  * history build and the latest-wins CDC snapshot apply — the two
  * operators a lakehouse ingestion layer runs on every change feed
  * (Kimball's SCD type 2; Delta/Hudi-style MERGE-latest semantics),
  * absent from the reference (its pipeline upserts via ON CONFLICT,
  * the A2 MERGE — these are the history-keeping and log-replay
  * generalizations of that shape).
  *
  * Both are ONE shuffle keyed on the entity with ordered windows
  * inside each partition — never a self-join and never a per-change
  * MERGE round trip, so a 100 TB change log replays as a single
  * keyed pass. All ordering is total (timestamp, then a unique id),
  * so ties are deterministic and any engine reproduces the history
  * bit-for-bit.
  */
object Cdc {

  /** TYPE-2 SCD history from a change stream: one row per VERSION of
    * the tracked attributes per key — a new version opens only when
    * the attribute tuple actually CHANGES (consecutive duplicates
    * collapse), carries `valid_from_us`/`valid_to_us` (epoch micros;
    * null `valid_to_us` = still open), a 1-based `version`, and
    * `is_current`.
    *
    * Change detection is `lag` over the total order (tsCol, idCol)
    * within each key; version-start rows ARE the history rows, so no
    * re-aggregation pass: `valid_to_us` is the `lead` of the next
    * version's start over the filtered set. Two window passes over
    * the SAME partitioning — one shuffle total, Catalyst reuses the
    * exchange.
    *
    * Null timestamps are excluded (the [[AsOf]] contract: "valid from
    * an unknown time" is undefined and NULLS-FIRST defaults diverge
    * across engines).
    *
    * @param changes  change stream: one row per observed state
    * @param keys     entity identity (the shuffle key)
    * @param tsCol    observation timestamp (TimestampType)
    * @param idCol    unique tiebreak making the per-key order total
    * @param attrCols tracked attributes; a version is a maximal run of
    *                 equal attr tuples
    */
  def scd2History(changes: DataFrame, keys: Seq[String], tsCol: String,
      idCol: String, attrCols: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    // null-safe inequality: a run of NULL attr values is one version,
    // and the first row per key (lag = null) always opens one
    val changed = !(attrs <=> lag(attrs, 1).over(w))
    // the version-start rows keep idCol as the tiebreak, so the second
    // window's order is the SAME total order (tsCol, idCol) as the
    // change-detection pass — two version-opening rows at one timestamp
    // get deterministic version/valid_to assignment on every engine
    val wk = Window.partitionBy(kc: _*)
      .orderBy(col("valid_from_us").asc, col("__vid").asc)
    changes.filter(col(tsCol).isNotNull)
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .select(kc ++ attrCols.map(col) ++ Seq(
        unix_micros(col(tsCol)).as("valid_from_us"),
        col(idCol).as("__vid")): _*)
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wk))
      .withColumn("version", row_number().over(wk))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop("__vid")
  }

  /** Latest-wins CDC APPLY: replay a change log onto a served base
    * snapshot and emit the new snapshot. Each change row carries an
    * op — `"U"` upsert (insert-or-replace the key's payload) or `"D"`
    * delete — and the key's FINAL state is decided by its latest
    * change (total order on (tsCol, idCol)); keys never touched by
    * the log keep their base row; keys whose latest op is a delete
    * are absent.
    *
    * Base rows enter the same ranked union as priority-floor rows
    * (side 0, below every change), so the whole apply is one
    * `row_number` per key over base ∪ changes — the MERGE statement's
    * semantics without a join, and replaying a log in K slices
    * composes: apply(apply(base, log₁), log₂) ≡ apply(base, log₁∪log₂)
    * whenever the slice boundary respects the timestamp order (the
    * spec pins this).
    *
    * @param base        current snapshot: (keys, payloadCols), one row
    *                    per key (a prior apply's output)
    * @param changes     change log: (keys, tsCol, idCol, opCol,
    *                    payloadCols)
    * @param opCol       "U" | "D" (validated in the plan: any other
    *                    value fails the job rather than silently
    *                    dropping)
    * @return the new snapshot: (keys, payloadCols)
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keys: Seq[String],
      tsCol: String, idCol: String, opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val out = keys ++ payloadCols
    val opOk = assert_true(col(opCol).isin("U", "D"),
      concat(lit(s"cdcApply: bad $opCol: "), col(opCol).cast("string")))
    // the tiebreak rides RAW (no cast): a lossy cast (e.g. a string
    // UUID to long) would silently NULL every tiebreak and make
    // latest-wins nondeterministic under equal timestamps
    val idT = changes.schema(idCol).dataType
    val c = changes.filter(col(tsCol).isNotNull)
      .withColumn("__del", when(opOk.isNull, col(opCol) === "D"))
      .withColumn("__side", lit(1))
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__id", col(idCol))
      .select(kc ++ payloadCols.map(col) ++
        Seq(col("__del"), col("__side"), col("__us"), col("__id")): _*)
    val b = base
      .withColumn("__del", lit(false))
      .withColumn("__side", lit(0))
      .withColumn("__us", lit(null).cast("long"))
      .withColumn("__id", lit(null).cast(idT))
      .select(kc ++ payloadCols.map(col) ++
        Seq(col("__del"), col("__side"), col("__us"), col("__id")): _*)
    val w = Window.partitionBy(kc: _*)
      .orderBy(col("__side").desc, col("__us").desc, col("__id").desc)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .select(out.map(col): _*)
  }
}
