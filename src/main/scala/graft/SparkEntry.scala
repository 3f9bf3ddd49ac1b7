package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextAnalysis
import graft.operators.{AuditDiff, Constraints, Curation, Dedup, Funnel, Layout, Relational, Similarity, Skew}
import graft.sources.Multimodal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] instantiates one operator family from
  * SURVEY.md §2 as a concrete query over the TPC-H-ish testdata tables
  * (FIXTURES.md §2); [[oracleSql]] holds the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01.
  *
  * Determinism rules used throughout (cross-engine hash-match):
  *  - money sums go through integer cents (`round(x*100)::bigint`) so double
  *    summation order can never flip a low bit;
  *  - every ranking has a total-order tiebreak;
  *  - column aliases are identical in the Spark plan and the oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact integer cents of a 2-decimal money double — associative sum. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Scratch dir for persisted-index/streaming queries: pid-suffixed so
    * two processes running the catalog concurrently cannot clobber each
    * other's files mid-read, and deleted on JVM exit (results are LAZY —
    * the files must outlive query construction, so cleanup cannot happen
    * inline; without the hook every bench/verify JVM would leave a full
    * index copy under java.io.tmpdir).
    */
  private val scratchHooked = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  /** Per-JVM run counter: streaming rows need a FRESH sink + checkpoint
    * per invocation (a reused AvailableNow checkpoint would see no new
    * files and emit nothing).
    */
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)
  private def scratchDir(prefix: String, key: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/${prefix}_" +
      java.lang.Integer.toHexString(key.hashCode) +
      s"_p${ProcessHandle.current().pid()}"
    if (scratchHooked.putIfAbsent(p, java.lang.Boolean.TRUE) == null)
      sys.addShutdownHook(deleteRecursively(new java.io.File(p)))
    p
  }
  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Query catalog. Key prefix groups: q0x core agg/filter, q1x joins,
  // q2x window/sort/set/dedup, q3x scalar-function surface, q4x
  // validation/audit/merge, q5x training-data extensions, q6x events.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A5/A6/A7 hash aggregate with partial+final combine (SURVEY §2.4).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_cents"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P4/P6 projection + conjunctive predicates pushed to parquet
    // (SURVEY §2.2 P1-P6).
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          // to_timestamp parses in the SESSION timezone (UTC) — a
          // java.sql.Timestamp literal would parse in the JVM default
          // zone and shift the boundary on non-UTC drivers
          col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice") * col("l_discount")).as("disc_cents"))
    }),

    // SQL-mode parity (SURVEY §3 E2): the SAME SQL string runs through
    // spark.sql over registered temp views AND through DuckDB as its own
    // oracle — one text, two engines, hash-equal results.
    "q03_sql_pricing" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sharedSql("q03_sql_pricing"))
    }),

    "q14_sql_join_agg" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sharedSql("q14_sql_join_agg"))
    }),

    // J1+J3 chained inner equi-joins (small dims auto-broadcast) +
    // group-count per nation (SURVEY §2.3 J1/J3, §2.4 A5/A7).
    "q10_join_revenue_by_nation" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val nat = t(s, dir, "nation")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // J2+A6 left outer join with null-skipping COUNT(col): orders with no
    // high-quantity lines must count 0, not disappear (SURVEY §2.3 J2, §2.4 A6).
    "q11_left_join_null_count" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"))
      ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_outer")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_linenumber")).as("big_lines"))
    }),

    // P7/J5 NOT IN → anti join: customers with no urgent orders
    // (SURVEY §2.2 P7, §2.3 J5). left_anti ≙ NOT EXISTS, which equals the
    // oracle's NOT IN here only because o_custkey is NOT NULL in the data;
    // a null in the subquery side would make SQL NOT IN return zero rows.
    "q12_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    }),

    // Semi join (EXISTS): customers with at least one urgent order.
    "q13_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
    }),

    // W1 per-group top-k via ranking window: top 2 orders per customer
    // (SURVEY §2.5 W1 — replaces the reference's per-category LIMIT loop,
    // process_publications_dag.py:161-178, with one shuffle).
    "q20_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // O1/O2/O3 global top-k with tiebreak → TakeOrderedAndProject
    // (SURVEY §2.6).
    "q21_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    }),

    // A8 HAVING on aggregate (duplicate-key detection shape,
    // process_publications_dag.py:489).
    "q22_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .filter(col("n_orders") > 12)
    }),

    // Set-distinct projection (SURVEY §2.4 A1 non-keyed half).
    "q23_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),

    // Set operations (SURVEY §2.7): urgent-customer keys minus F-order
    // customers, plus the intersection with high-balance customers.
    "q24_set_ops" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val finished = ord.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("o_custkey"))
      urgent.except(finished).unionByName(urgent.intersect(rich)).distinct()
    }),

    // A2 MERGE/upsert with per-column resolution (ON CONFLICT DO UPDATE,
    // process_publications_dag.py:224-232): delta updates acctbal
    // unconditionally, mktsegment only when non-null (COALESCE semantics),
    // unmatched delta rows insert.
    "q25_merge_upsert" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val updates = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("c_acctbal") + 1000).as("c_acctbal"),
          lit(null).cast("string").as("c_mktsegment"))
      val inserts = cust.filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 10000000).as("c_custkey"), col("c_name"),
          col("c_nationkey"), lit(0.0).as("c_acctbal"),
          lit("NEW").as("c_mktsegment"))
      Relational.merge(cust, updates.unionByName(inserts), Seq("c_custkey"),
        Map("c_acctbal" -> Relational.Overwrite,
            "c_mktsegment" -> Relational.CoalesceNewOld,
            "c_name" -> Relational.KeepOld,
            "c_nationkey" -> Relational.KeepOld))
    }),

    // A1 keyed dedup with UNIQUE-null semantics: null keys all survive,
    // non-null keys keep the lowest-custkey representative.
    "q26_dedup_nulldistinct" -> ((s, dir) => {
      val keyed = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(col("c_nationkey").cast("string"), lit("-"),
            col("c_mktsegment"))).as("k"))
      Relational.dedupByKey(keyed, "k", Seq(col("c_custkey").asc))
    }),

    // A3 SERIAL-style surrogate-key allocation: dense ids for new dim
    // values, distributed (sort + zipWithIndex, no single-partition window).
    "q27_surrogate_keys" -> ((s, dir) => {
      val dim = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"))
      val incoming = t(s, dir, "supplier").select(col("s_name").as("name"))
      Relational.upsertDim(dim, incoming, "name")
    }),

    // F8 ordered contains→case chain (extract_publication_type,
    // process_publications_dag.py:271-304 — branch order is semantic).
    "q30_case_chain" -> ((s, dir) => {
      val c = col("p_type")
      t(s, dir, "part").select(
        col("p_partkey"),
        when(c.contains("PROMO ANODIZED"), "promo-anodized")
          .when(c.contains("PROMO"), "promo")
          .when(c.contains("ECONOMY ANODIZED"), "economy-anodized")
          .when(c.contains("ECONOMY"), "economy")
          .when(c.contains("STANDARD"), "standard")
          .when(c.contains("MEDIUM"), "medium")
          .when(c.contains("SMALL"), "small")
          .when(c.contains("LARGE"), "large")
          .otherwise("Unknown").as("p_class"))
    }),

    // F9 small-map normalization with default (map_to_normalized_category,
    // process_publications_dag.py:397-421): broadcast lookup + coalesce
    // default — most values intentionally collapse to 'Other'.
    "q31_lookup_normalize" -> ((s, dir) => {
      val s2 = s
      import s2.implicits._
      val lookup = Seq(
        ("FRANCE", "Western Europe"), ("GERMANY", "Western Europe"),
        ("JAPAN", "East Asia"), ("CHINA", "East Asia"))
        .toDF("n_name", "norm")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(lookup), Seq("n_name"), "left")
        .select(col("c_custkey"),
          coalesce(col("norm"), lit("Other")).as("norm_region"))
    }),

    // F1-F4/F7/F10 string-function surface: length/trim/split/element_at
    // with fallback/concat (SURVEY §2.8).
    "q32_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        length(trim(col("p_name"))).as("name_len"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        when(col("p_name").contains(" "),
          trim(element_at(split(col("p_name"), " "), 1)))
          .otherwise(lit("Unknown")).as("first_word"),
        concat(lit("brand:"), col("p_brand")).as("brand_tag"),
        upper(col("p_brand")).as("brand_uc"))
    }),

    // F6 + date bucketing: epoch-stable month truncation (cross-engine as
    // unix seconds), year/month extraction.
    "q33_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_start_epoch"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
    }),

    // F5 coalesce/nullif conditional cleaning (clean-stage shape).
    "q34_conditional_clean" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        coalesce(nullif(trim(col("c_mktsegment")), lit("")), lit("Unknown"))
          .as("segment"),
        when(col("c_acctbal") < 0, "delinquent")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"))
    }),

    // C1 audit/change-capture as snapshot diff (trigger → full-outer diff;
    // aupostgres.sql:82-97). JSON payload is exercised in ScalaTest; the
    // oracle checks the classification core.
    "q40_audit_diff" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val newSnap = cust
        .filter(col("c_custkey") % 50 =!= 0) // deletes
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 5).otherwise(col("c_acctbal")))
        .unionByName(cust.filter(col("c_custkey") % 100 === 0)
          .withColumn("c_custkey", col("c_custkey") + 9000000)) // inserts
      AuditDiff.diff(cust, newSnap, "c_custkey", "customer")
        .select(col("table_name"), col("operation"), col("pk").cast("long").as("pk"))
    }),

    // V1-V4 constraint/validation report: CHECK, UNIQUE (null-distinct),
    // FK via anti join, single pass for scan-shaped checks.
    "q41_constraints_report" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val scan = Constraints.scanReport(cust, Seq(
        Constraints.Check("check_acctbal_nonneg", col("c_acctbal") >= 0),
        Constraints.NotNull("c_mktsegment"),
        Constraints.Check("check_name_nonempty", length(trim(col("c_name"))) > 1)))
      Constraints.report(Seq(
        scan,
        Constraints.unique(ord, Seq("o_custkey"), "unique_orders_custkey"),
        Constraints.foreignKey(ord, "o_custkey",
          cust.filter(col("c_acctbal") > 0), "c_custkey",
          "fk_orders_positive_customer")))
    }),

    // Grouping-sets surface: ROLLUP subtotals (extension beyond the
    // reference's plain GROUP BY).
    "q28_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // Exact distinct aggregation (expand + two-phase agg under the hood).
    "q29_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    // Regex surface: extract + replace with simple (engine-portable)
    // patterns.
    "q35_regex_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^([0-9]+)-", 1).as("prio_num"),
        regexp_replace(col("o_orderpriority"), "[^A-Z]", "").as("prio_word"))
    }),

    // Array-function surface: split/sort/contains/size over p_type words.
    "q36_array_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        size(split(col("p_type"), " ")).as("n_words"),
        array_contains(split(col("p_type"), " "), "BRUSHED").as("is_brushed"),
        concat_ws(",", array_sort(split(col("p_type"), " "))).as("sorted_words"))
    }),

    // Date arithmetic surface: diffs, month addition (end-of-month
    // clamped identically in both engines), calendar parts.
    "q37_date_arith" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01")))
          .as("days_since"),
        unix_timestamp(add_months(col("o_orderdate"), 3).cast("timestamp"))
          .as("plus3m_epoch"),
        quarter(col("o_orderdate")).as("q"),
        (weekday(col("o_orderdate")) + 1).as("isodow"))
    }),

    // Analytic windows beyond ranking: running sum + lag delta per
    // supplier. The synthetic lineitem does NOT have unique
    // (orderkey, linenumber), so the value itself is the final tiebreak —
    // rows tying on ALL order keys are then interchangeable and the output
    // multiset is deterministic.
    "q38_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("price_cents").asc)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
        .withColumn("running_cents",
          sum(col("price_cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_cents", lag(col("price_cents"), 1).over(w))
    }),

    // CUBE grouping sets: all four aggregation granularities in one pass.
    "q39_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    }),

    // Scalar subquery: rows above the global mean, compared in exact
    // integer cents (price·N > Σcents) so no double-summation boundary.
    "q47_scalar_subquery" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val totals = ord.agg(
        sum(cents(col("o_totalprice"))).as("__sum_cents"),
        count(lit(1)).as("__n"))
      ord.crossJoin(broadcast(totals))
        .filter(cents(col("o_totalprice")) * col("__n") > col("__sum_cents"))
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    }),

    // GROUPING SETS (the general form behind rollup/cube) — shared SQL
    // text runs identically in both engines.
    "q43_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sharedSql("q43_grouping_sets"))
    }),

    // Exact median (interpolating percentile) per group on integer cents
    // — (a+b)/2 on integers is IEEE-exact in any engine.
    "q44_median" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile(cents(col("o_totalprice")), lit(0.5)).as("median_cents"),
          count(lit(1)).as("n_orders"))
    }),

    // Pivot (CASE-aggregation shape) — wide per-returnflag quantities.
    "q42_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
    }),

    // ---- training-data extension surface (documents / embeddings / events)

    // Exact dedup clusters on an 8-word prefix fingerprint (hash groupBy).
    "q50_dedup_exact" -> ((s, dir) => {
      Dedup.exactClusters(t(s, dir, "documents"), "doc_id",
        TextAnalysis.prefixFingerprint(col("text"), 8))
    }),

    // MinHash+LSH near-dup pairs: shingle→sign→band→bucket-join→verify.
    "q51_dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Exact n-gram Jaccard pairs via shingle inverted index.
    "q52_dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)
    }),

    // SimHash near-dup pairs (60-bit md5-derived, 4-band pigeonhole).
    "q53_dedup_simhash" -> ((s, dir) => {
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 6)
    }),

    // Brute-force cosine top-k ANN baseline (quantized-exact arithmetic).
    "q54_ann_brute_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") % 25 === 0), emb,
        "vec_id", "embedding", k = 10)
    }),

    // Embedding-cosine near-dup pairs above a threshold.
    "q55_embedding_neardup" -> ((s, dir) => {
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35)
    }),

    // LSH-bucketed ANN (sign random projections, integer-exact buckets).
    // Oracle: the plane literals are rendered into DuckDB SQL at verify
    // time (SimilarityOracle.lshTopKSql) — same technique as q51/q53.
    "q56_ann_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") % 25 === 0), emb,
        "vec_id", "embedding", k = 10)
    }),

    // IVF (k-means coarse quantizer) ANN — the 100 TB scale path. The
    // integer k-means is deterministic, so the oracle replays the trained
    // centroids as literals (SimilarityOracle.ivfTopKSql).
    "q57_ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") % 25 === 0), emb,
        "vec_id", "embedding", k = 10)
    }),

    // Sub-quadratic embedding near-dup: sign-projection banded candidates
    // + exact cosine verify (documented recall; oracle mirrors the bands).
    "q67_neardup_lsh_banded" -> ((s, dir) => {
      Similarity.nearDupPairsBanded(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45)
    }),

    // IVF-PQ ANN — IVF routing + product-quantized codes; candidates are
    // scored from nSub small ints per vector (asymmetric distance), the
    // raw vectors projected away after encoding. The memory path that
    // keeps a 100 TB corpus's serving index cluster-resident. Integer
    // Lloyd on both quantizers → the oracle replays codebooks as
    // literals (SimilarityOracle.ivfPqTopKSql).
    "q116_ann_ivf_pq_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.filter(col("vec_id") % 25 === 0), emb,
        "vec_id", "embedding", k = 10)
    }),

    // Dedup clustering: pairwise minhash signals → connected components
    // (min-label propagation; component id = representative doc).
    "q68_dedup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // a real handle, threaded INTO components as `upstream`: the
      // edge count folds the pairs pipeline into the edge cache, and
      // components releases the shingle sets right there — BEFORE the
      // label rounds, whose GC the dead cache otherwise amplifies by
      // 2-2.6 s/run at sf0.1 (the q68/q108 bench-band fix)
      val cache = new Dedup.CacheHandle()
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          cache = cache)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(docs.select(col("doc_id")),
          "doc_id", pairs, upstream = cache)
        .select(col("id").as("doc_id"), col("component"))
    }),

    // Skew-safe two-phase aggregation: group by (key, salt) then combine —
    // results must be IDENTICAL to the plain GROUP BY (the oracle), which
    // is exactly what makes salting sound for decomposable aggs.
    "q70_salted_agg" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("vc"))
      graft.operators.Skew.saltedAggregate(ev, Seq("event_type"), salts = 16,
        partial = Seq(sum(col("vc")).as("__s"), count(lit(1)).as("__c")),
        combine = Seq(sum(col("__s")).as("value_cents"),
          sum(col("__c")).as("n_events")))
    }),

    // Quality gate: heuristic score + BPE-ish token estimate per doc.
    "q71_quality_gate" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"),
        TextAnalysis.bpeTokenEstimate(col("text")).as("bpe_tokens"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("is_kept"))
    }),

    // As-of join: each purchase attributed to the user's latest
    // prior-or-simultaneous click (union + running-last window — one
    // shuffle on user_id, no range theta-join).
    "q69_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_timestamp(col("ts")).as("ts_sec"),
        cents(col("value")).as("value_cents"))
      val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
      val clicks = ev.filter(col("event_type") === "click").drop("event_type")
      graft.operators.AsOf.joinAsOf(purchases, clicks, Seq("user_id"),
        "ts_sec", payload = Seq("value_cents"), tieBreak = "event_id")
    }),

    // Token counting + quality metrics (exact-integer ratios).
    "q58_text_stats" -> ((s, dir) => {
      val m = TextAnalysis.qualityMetrics(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
        m("n_tokens").as("n_tokens"),
        m("n_chars").as("n_chars_len"),
        m("avg_token_len").as("avg_token_len"),
        m("uniq_token_ratio").as("uniq_token_ratio"))
    }),

    // Language-ID heuristic: marker-occurrence argmax with tiebreak.
    "q59_langid" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        (TextAnalysis.langId(col("text")) === col("lang")).as("is_match"))
    }),

    // Document fingerprinting (normalized md5 + prefix hash).
    "q60_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.prefixFingerprint(col("text"), 8).as("prefix_fp"))
    }),

    // Tumbling-window aggregation over events (batch form of the
    // Structured Streaming pipeline in graft.streaming).
    "q61_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
    }),

    // Sessionization: 30-min-gap sessions per user (lag + running sum).
    "q62_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_sec"))
        .withColumn("new_sess",
          when(col("ts_sec") - lag(col("ts_sec"), 1).over(byUser) <= 1800, 0)
            .otherwise(1))
        .withColumn("session_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_sec")).as("start_sec"),
          (max(col("ts_sec")) - min(col("ts_sec"))).as("duration_sec"))
    }),

    // Sliding-window aggregation (batch twin of the streaming
    // slidingTypeRates): every event lands in size/slide = 4 windows.
    "q73_events_sliding" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), unix_timestamp(col("ts")).as("ts_sec"))
        .withColumn("w_start",
          explode(transform(sequence(lit(0), lit(3)),
            k => (col("ts_sec") - col("ts_sec") % 900) - k * 900)))
        .groupBy(col("w_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
    }),

    // RANGE-frame window: for each error event, how many clicks the same
    // user made in the preceding 10 minutes (union + range frame — the
    // batch form of a stream-stream interval join, no theta join).
    "q74_range_window" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("error", "click"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_sec"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"))
        .rangeBetween(-600, 0)
      ev.withColumn("clicks_10m",
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_sec"), col("clicks_10m"))
    }),

    // F11 nested-JSON access: parse the props JSON column.
    "q63_json_props" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k"),
          count(lit(1)).as("n"))
    }),

    // Ensemble near-dup: a pair is flagged if EITHER the text signal
    // (3-gram Jaccard ≥ 0.5) OR the embedding signal (banded cosine
    // ≥ 0.45) fires — the standard belt-and-braces curation setup.
    // The embedding leg is the SUB-QUADRATIC banded path (documented
    // recall; the oracle mirrors its bands), so the default ensemble is
    // scale-safe end to end; the deliberately-exact O(n²) threshold scan
    // remains available as the named baseline q55 (as q54 is for top-k).
    "q65_dedup_ensemble" -> ((s, dir) => {
      val textPairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), lit("text").as("signal"))
      val embPairs = Similarity.nearDupPairsBanded(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.45)
        .select(col("id_a"), col("id_b"), lit("embedding").as("signal"))
      textPairs.unionByName(embPairs)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_signals"),
          array_join(array_sort(collect_set(col("signal"))), ",").as("signals"))
    }),

    // Composed curation pipeline: quality-gate → exact-dedup (best = min
    // doc_id per normalized fingerprint) → per-language counts. The whole
    // chain is one declarative plan: filter pushdown + one dedup shuffle +
    // one agg shuffle.
    "q66_curation_pipeline" -> ((s, dir) => {
      val m = TextAnalysis.qualityMetrics(col("text"))
      val gated = t(s, dir, "documents")
        .withColumn("n_tokens", m("n_tokens"))
        .withColumn("uniq_ratio", m("uniq_token_ratio"))
        .filter(col("n_tokens") >= 20 && col("uniq_ratio") >= 0.2)
      Relational.dedupByKey(
          gated.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
          "fp", Seq(col("doc_id").asc))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // Full near-dup curation pipeline in ONE declarative chain: quality
    // gate → minhash pair graph over the survivors → connected-components
    // clustering → representatives only → per-language stats. The
    // training-data shape: q66 with fuzzy (not just exact) dedup.
    "q72_curation_neardup" -> ((s, dir) => {
      val m = TextAnalysis.qualityMetrics(col("text"))
      val gated = t(s, dir, "documents")
        .withColumn("n_tokens", m("n_tokens"))
        .withColumn("uniq_ratio", m("uniq_token_ratio"))
        .filter(col("n_tokens") >= 20 && col("uniq_ratio") >= 0.2)
      val cache = new Dedup.CacheHandle()
      val pairs = Dedup.minHashLshPairs(gated, "doc_id", "text",
          cache = cache)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupByComponents(gated, "doc_id", pairs, upstream = cache)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // Multimodal plumbing: opaque binary column + typed metadata (the
    // decode itself is stubbed — see graft.sources.Multimodal).
    "q64_multimodal_meta" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(md5(col("text"))).as("blob"))
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          substring(hex(col("blob")), 1, 8).as("hex8"))
    }),

    // Deterministic stratified sampling: per-language keep rate, with
    // membership decided by an md5-derived hash of the id — reproducible
    // across engines/runs and stable under repartition (rand()-based
    // sampling is neither). Scan-linear: the predicate is pure
    // projection, no shuffle, so it holds at any corpus size.
    "q75_stratified_sample" -> ((s, dir) => {
      val bucket = Curation.md5Bucket("smp:", col("doc_id"))
      t(s, dir, "documents")
        .withColumn("bucket", bucket)
        // downsample the dominant language, keep more of the rest — the
        // usual training-mix rebalancing shape
        .filter(col("bucket") < when(col("lang") === "en", 5).otherwise(20))
        .select(col("doc_id"), col("lang"), col("bucket"))
    }),

    // TF-IDF-style top terms per language. The score is EXACT-INTEGER:
    // (tf · 1e6) DIV df — engines disagree on log() ulps, never on BIGINT
    // division — and ranking tie-breaks on the token, so the top-10 cut
    // is total-ordered. Two aggregations (tf by (lang, token), df by
    // token) + one ranking window; each is a single keyed shuffle.
    "q76_tfidf_topterms" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
      val tf = tok.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tok.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score").desc, col("token").asc)
      tf.join(dfreq, "token")
        .withColumn("score", expr("(tf * 1000000) DIV df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("lang"), col("token"), col("tf"), col("df"),
          col("score"), col("rn").cast("int").as("rn"))
    }),

    // Corpus vocabulary: top-100 tokens by occurrence (tokenizer/vocab
    // building). ORDER BY + LIMIT plans TakeOrderedAndProject over the
    // aggregated frame — no global sort of the token universe.
    "q77_vocab_topk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occ").desc, col("token").asc)
        .limit(100)
    }),

    // Document-length histogram: fixed-width token-count buckets (cap at
    // bucket 19) + each bucket's share of the corpus. The share divides
    // two exact longs (the window total runs over the ~20 aggregated
    // rows, not the corpus), so the doubles are bit-identical anywhere.
    "q78_length_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
        .withColumn("bucket", least(expr("n_tokens DIV 50"), lit(19L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .withColumn("share", col("n_docs").cast("double") /
          sum(col("n_docs")).over(Window.partitionBy(lit(0))))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"), col("share"))
    }),

    // Per-dimension embedding statistics (training-data QA: spot dead or
    // saturated dimensions). Quantized-exact longs; the only double is
    // the final mean division. posexplode → one shuffle on (pos).
    "q79_embedding_dim_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(posexplode(Similarity.quantize(col("embedding"))).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_milli"),
          min(col("x")).as("min_milli"), max(col("x")).as("max_milli"))
        .withColumn("mean_milli", col("sum_milli").cast("double") / col("n"))
    }),

    // Incremental dedup: a "new batch" (doc_id % 10 = 0) admitted only if
    // its content fingerprint is unseen in the existing corpus — the
    // daily-drop dedup shape. One anti-join shuffle on the fingerprint;
    // at scale the corpus side is the persisted fingerprint store, read
    // as a pruned single-column scan.
    "q80_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val newBatch = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      newBatch.join(corpus.select(col("fp")), Seq("fp"), "left_anti")
        .select(col("doc_id"), col("lang"), col("fp"))
    }),

    // Exactly-k per-stratum sample: rank docs inside each language by an
    // md5 hash of the id (a deterministic uniform shuffle both engines
    // replay bit-identically) and keep the first 30 — the fixed-size
    // counterpart of q75's rate sampling. One ranking window per
    // stratum; strata partition the shuffle, so a skewed language costs
    // one fat partition, not a global sort.
    "q81_sample_exact_k" -> ((s, dir) => {
      val hkey = md5(concat(lit("rk:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("hkey").asc, col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("hkey", hkey)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 30)
        .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk"))
    }),

    // Truncation-style near-dup clusters: docs sharing an 8-word prefix
    // fingerprint (same opening, diverging tails — the classic
    // scraped-page truncation artifact). One shuffle on the prefix hash.
    "q82_prefix_clusters" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("prefix_fp", TextAnalysis.prefixFingerprint(col("text"), 8))
        .groupBy(col("prefix_fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("representative"))
        .filter(col("n_docs") > 1)
    }),

    // Benchmark decontamination: drop corpus docs sharing any 3-gram with
    // the "benchmark" slice (doc_id % 97 == 0) — the n-gram-overlap rule
    // of public LLM data pipelines. Benchmark postings broadcast; the
    // corpus side stays scan-shaped (explode → semi-probe → anti join).
    "q83_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      Curation.decontaminate(corpus, bench, "doc_id", "text", 3)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // KMV distinct sketch: per-lang distinct-text estimate from the k=16
    // smallest 60-bit md5 hashes. Engine-portable (unlike HLL) so the
    // ESTIMATE itself is oracle-verified bit-exactly.
    "q84_kmv_distinct" -> ((s, dir) =>
      Curation.kmvDistinct(t(s, dir, "documents"), Seq("lang"), col("text"), 16)),

    // Z-order (Morton) clustering key over (user bucket, minute-of-day):
    // the multi-column data-skipping layout key, as pure bit arithmetic.
    "q85_zorder_key" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val x = col("user_id") % 2048
      val y = hour(col("ts")) * 60 + minute(col("ts"))
      e.select(col("event_id"), x.as("xb"), y.cast("long").as("yb"),
          Layout.zOrder2(x, y, 11).as("z"))
        .orderBy(col("z").desc, col("event_id").asc)
        .limit(100)
    }),

    // Sequence packing: fill fixed 512-token shards per lang in doc_id
    // order (running-sum window, one shuffle) → shard manifest.
    "q86_pack_shards" -> ((s, dir) =>
      Curation.packShards(t(s, dir, "documents"), "lang", "doc_id",
        TextAnalysis.tokenCount(col("text")), 512)),

    // Sliding-window chunking: 32-token windows every 24 tokens — the
    // doc → training-sequence map. Zero shuffles (scan + explode).
    "q87_doc_chunks" -> ((s, dir) =>
      Curation.chunk(t(s, dir, "documents"), "doc_id", "text", 32, 24)),

    // Corpus mixing by epoch replication: en×2, zh×3, de dropped, rest
    // ×1, each replica with a deterministic interleave key.
    "q88_corpus_mix" -> ((s, dir) =>
      Curation.mixByEpochs(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 2, "zh" -> 3, "de" -> 0), defaultEpochs = 1)
        .select(col("doc_id"), col("lang"), col("epoch").cast("int").as("epoch"),
          col("mix_key"))),

    // Gopher repetition rules: top-bigram and duplicated-bigram fractions
    // per doc — two keyed shuffles, scan-linear.
    "q89_repetition_stats" -> ((s, dir) =>
      Curation.repetitionStats(t(s, dir, "documents"), "doc_id", "text", n = 2)),

    // ExactSubstr-style duplicated 8-gram fraction: the partial-overlap
    // dedup signal whole-doc fingerprints cannot see.
    "q90_dup_ngrams" -> ((s, dir) =>
      Curation.dupNgramStats(t(s, dir, "documents"), "doc_id", "text", n = 8)),

    // SemDeDup-flavored outliers: top-5 farthest vectors from each
    // label's integer-quantized centroid (exact ranking, no FP drift).
    "q91_embedding_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", topK = 5)),

    // Corpus-mix planning: per-(lang, source) exact token counts and the
    // T=0.5 temperature weight (deliberately unnormalized — see Scaladoc).
    "q92_mix_weights" -> ((s, dir) =>
      Curation.mixWeights(t(s, dir, "documents"), Seq("lang", "source"),
        TextAnalysis.tokenCount(col("text")))),

    // Ordered conversion funnel over the event log: one shuffle on the
    // user key, k window-mins over it, one global fold to stage counts.
    "q93_event_funnel" -> ((s, dir) =>
      Funnel.reach(t(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),

    // Cross-source duplication matrix: which sources copy from which —
    // duplicate pairs bucketed by unordered source pair. Keyed on the
    // 8-word prefix fingerprint (truncation-style near-dups, present at
    // every scale factor); hash self-join, no cross product.
    "q94_dup_source_matrix" -> ((s, dir) =>
      Dedup.crossGroupDupMatrix(t(s, dir, "documents"), "doc_id", "source",
        TextAnalysis.prefixFingerprint(col("text"), 8))),

    // Length stratification: NTILE(4) length bands per language with
    // exact per-band token stats (curriculum / context-length splits).
    "q95_length_strata" -> ((s, dir) =>
      Curation.lengthStrata(t(s, dir, "documents"), "lang", "doc_id",
        TextAnalysis.tokenCount(col("text")), 4)),

    // Tokenizer-fertility planning: BPE-ish subword estimate vs
    // whitespace tokens per language — the budget ratio a multilingual
    // mix planner needs. Scan + one agg; one final exact-int division.
    "q96_token_fertility" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws"),
          TextAnalysis.bpeTokenEstimate(col("text")).cast("long").as("bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
          sum(col("bpe")).as("bpe_tokens"))
        .withColumn("fertility",
          col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))),

    // Source-concentration (HHI) per language: single-source dominance
    // diagnostic over the corpus mix. Two map-side-combined aggregates.
    "q97_source_hhi" -> ((s, dir) =>
      Curation.concentration(t(s, dir, "documents"), "lang", "source")),

    // Exact interpolating length quantiles per language (p10/p50/p90 of
    // token counts) — the context-length planning profile. Exact
    // percentile (one per-group sort), not approx sketches: the sketch
    // variant (approx_percentile / t-digest) is engine-specific and
    // cannot hash-match an oracle; at 100 TB swap in approx_percentile
    // with a documented error bound.
    "q98_length_quantiles" -> ((s, dir) => {
      val tok = TextAnalysis.tokenCount(col("text")).cast("long")
      t(s, dir, "documents")
        .select(col("lang"), tok.as("tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          percentile(col("tok"), lit(0.1)).as("p10"),
          percentile(col("tok"), lit(0.5)).as("p50"),
          percentile(col("tok"), lit(0.9)).as("p90"))
    }),

    // Pearson correlation from EXACT integer moments (decimal sums, so
    // n·Σxx cannot overflow), with the final formula spelled out as the
    // same correctly-rounded double ops in both engines — the built-in
    // corr() accumulates doubles in partition order and is NOT
    // reproducible, so it cannot be oracle-hashed.
    "q99_value_hour_corr" -> ((s, dir) => {
      val dec = "decimal(38,0)"
      val e = t(s, dir, "events").select(col("event_type"),
        cents(col("value")).cast(dec).as("x"),
        hour(col("ts")).cast(dec).as("y"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("n").cast("long").as("n_events"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("pearson"))
    }),

    // Incremental fuzzy dedup: tonight's batch (doc_id % 10 == 0) probes
    // the corpus's LSH band index — within-corpus pairs never form. The
    // production pattern where the corpus bands are a stored index.
    "q100_incremental_minhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minHashLshPairsAcross(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text")
    }),

    // The STORED form of q100: build the corpus band index, persist it
    // (bands partitioned by band, shingle sets, parameters), load it
    // back, probe with the new batch — the serve path a production
    // ingest runs nightly. Must equal q100 exactly (same oracle).
    "q101_band_index_probe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_band_index", dir)
      Dedup.saveBandIndex(
        Dedup.buildBandIndex(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text"), idxDir)
      Dedup.minHashLshProbe(Dedup.loadBandIndex(s, idxDir),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
    }),

    // The multimodal DECODE path itself (not just the metadata
    // projection of q64): per-partition decoder over the opaque binary
    // payloads via Multimodal.extractFeatures. The stub decoder is
    // deterministic (md5-derived), so the mapPartitions stage sits under
    // the DuckDB oracle like any other operator; features are quantized
    // to exact milli longs for a stable cross-engine hash, and the
    // feature vector is posexploded to one SCALAR row per (media, index)
    // — catalog rule: no array/struct output columns, the driver's
    // pandas comparator cannot sort/hash them.
    "q102_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.demoMediaTable(t(s, dir, "documents"))
      Multimodal.extractFeatures(media, new Multimodal.DeterministicStubDecoder(8))
        .select(col("media_id"), col("width"), col("height"), col("n_bytes"),
          posexplode(transform(col("features"),
            f => round(f.cast("double") * 1000).cast("long")))
            .as(Seq("f_idx", "f_milli")))
    }),

    // Salted JOIN (the skew shape AQE's skew handling does not cover when
    // the build side must replicate): orders join customer through
    // Skew.saltedJoin — results must equal the plain join, which IS the
    // oracle (the q70 pattern, for joins).
    "q103_salted_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Skew.saltedJoin(orders, cust, "o_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
    }),

    // PII detection + redaction — the compliance gate before a corpus
    // ships. The synthetic text carries no PII, so deterministic
    // addresses/phones/IPs are planted first (keyed on doc_id), then
    // scrubbed; the redacted char sum verifies the REDACTION itself, not
    // just the counts. Scan-linear codegen'd regexes, no UDF.
    "q104_pii_scrub" -> ((s, dir) => {
      val planted = t(s, dir, "documents").withColumn("t",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" call 555-010-0199 now")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" from 10.0.42.7 today")).otherwise(lit(""))))
      val cnt = TextAnalysis.piiCounts(col("t"))
      planted.select(col("lang"),
          cnt("email").cast("long").as("ne"), cnt("phone").cast("long").as("np"),
          cnt("ipv4").cast("long").as("ni"),
          length(TextAnalysis.scrubPii(col("t"))).cast("long").as("rl"))
        .groupBy(col("lang"))
        .agg(sum(col("ne")).as("emails"), sum(col("np")).as("phones"),
          sum(col("ni")).as("ips"),
          count(when(col("ne") + col("np") + col("ni") > 0, lit(1)))
            .as("docs_with_pii"),
          sum(col("rl")).as("redacted_chars"))
    }),

    // Quality-POLICY near-dup dedup: per cluster keep the LONGEST doc
    // (ties min id) instead of q72's min-id rule — the curation choice
    // when a truncated page and its full twin collide. Integer score, so
    // the survivor set is bit-deterministic in any engine.
    "q105_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      val cache = new Dedup.CacheHandle()
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          cache = cache)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupByComponentsBest(docs, "doc_id", pairs,
          col("n_tokens"), upstream = cache)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // Incremental ANN index maintenance: build+persist IVF on the
    // corpus, APPEND tonight's batch (assigned to the existing
    // centroids, no retrain, existing files untouched), serve top-k
    // against the updated stored index — the IVF twin of q101's band
    // probe. Oracle replays centroids trained on the corpus subset only.
    "q106_ivf_index_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_ivf_index", dir)
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      Similarity.appendIvfIndex(s, idxDir,
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
      Similarity.ivfSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadIvfIndex(s, idxDir), "vec_id", "embedding", k = 10)
    }),

    // Deterministic train/val/test split (90/5/5 on an md5 bucket of the
    // id): reproducible across engines and runs, stable under
    // repartition — a rand() split is neither. Exact per-(lang, split)
    // doc and token counts; scan-linear, one agg shuffle.
    "q107_corpus_split" -> ((s, dir) => {
      val bucket = Curation.md5Bucket("split:", col("doc_id"))
      t(s, dir, "documents")
        .withColumn("split",
          when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
    }),

    // Leakage-SAFE variant of q107: the split hashes each doc's near-dup
    // COMPONENT representative, so minhash twins can never straddle the
    // train/eval boundary (the doc-level split of q107 lets them, which
    // silently inflates eval numbers).
    "q108_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cache = new Dedup.CacheHandle()
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          cache = cache)
        .select(col("id_a"), col("id_b"))
      Curation.clusterAwareSplit(docs, "doc_id", pairs, upstream = cache)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Rare-token quality gate — the log-free form of the CCNet-style
    // unigram-LM filter: per doc, the mean CORPUS frequency of its
    // tokens, in exact integers (log p would differ in engine libm
    // ulps and can never hash-match; an integer mean ranks documents
    // identically for the gate's purpose). Low mean = assembled from
    // rare/garbled tokens; high mean = stopword boilerplate — both
    // tails are curation flags. Two keyed shuffles (term frequency,
    // per-doc agg); the tf join fans 1:1 per token. Long-arithmetic
    // bound: sum_ctf·1000 < 2⁶³ holds while a doc's tokens' corpus
    // frequencies sum below ~9·10¹⁵ — past that drop the milli scale.
    // Skew: raw-token join keys are Zipfian (stopwords are classic hot
    // keys at 100× corpus), so the tf dim splits at a df threshold —
    // the tiny hot head broadcasts (those tokens never enter an
    // exchange), only the long tail shuffle-joins (Skew.hotColdJoin).
    "q109_rare_token_gate" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("ctf"))
      Skew.hotColdJoin(toks, tf, "tok", isHot = col("ctf") >= 1000L)
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("ctf")).as("sum_ctf"))
        // truncating long DIV == DuckDB's flooring // for positives
        // (Column./ would be double division)
        .withColumn("mean_ctf_milli", expr("sum_ctf * 1000 DIV n_tokens"))
    }),

    // Streaming ingest UNDER THE ORACLE: the curation gate+dedup runs as
    // a real Structured Streaming query (file source over the static
    // documents drop, Trigger.AvailableNow, parquet sink + checkpoint),
    // then the materialized sink is aggregated. The grouping key derives
    // ONLY from the normalized text (token-count bucket): the stream's
    // dedup keeps the first-arriving row per fingerprint, and exact-dup
    // groups can disagree on `lang` (7 such groups at sf0.1), so a
    // lang-grouped result would depend on file/partition arrival order.
    "q110_stream_curate" -> ((s, dir) => {
      val base = scratchDir("graft_stream_curate", dir)
      val run = streamRuns.incrementAndGet()
      // the file stream source requires a DIRECTORY — stage the static
      // drop into a scratch landing dir (what a real ingest has anyway)
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        java.nio.file.Paths.get(s"$landing/documents.parquet"))
      val curated = graft.streaming.DocumentStreams.curateAvailableNow(
        s, landing.toString, s"$base/out$run", s"$base/ckpt$run")
      curated
        .groupBy(expr("n_tokens DIV 50").as("tok_bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    }),

    // The registered-SQL surface under an oracle: the query is SQL TEXT
    // calling scrub_pii/pii_count from GraftFunctionRegistry (q104
    // exercises the Column forms; this row proves the spark.sql registry
    // path plans the same codegen'd expressions).
    "q111_sql_pii_registry" -> ((s, dir) => {
      org.apache.spark.sql.graft.GraftFunctionRegistry.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_q111")
      s.sql("""
        SELECT lang,
          sum(CAST(pii_count(t) AS BIGINT)) AS n_pii,
          sum(CAST(length(scrub_pii(t)) AS BIGINT)) AS redacted_chars,
          count(*) AS n_docs
        FROM (SELECT lang,
                concat(text,
                  CASE WHEN doc_id % 7 = 0
                    THEN concat(' contact u', CAST(doc_id AS STRING), '@example.com')
                    ELSE '' END,
                  CASE WHEN doc_id % 11 = 0 THEN ' call 555-010-0199 now' ELSE '' END,
                  CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.42.7 today' ELSE '' END) AS t
              FROM documents_q111)
        GROUP BY lang""")
    }),

    // The nightly-ingest LOOP closed on the MinHash side (the band-index
    // twin of q106's IVF append): build+persist the corpus index, probe
    // drop1, APPEND drop1 (banded with the index's own stored params,
    // existing files untouched), probe drop2 — which now near-dups
    // against corpus AND drop1. Probe-then-append order matters: an
    // appended batch probing itself would emit degenerate self-pairs.
    // probe1 is persisted before the append because its plan reads the
    // index files the append extends (lazy evaluation would see drop1
    // on both sides).
    "q112_band_index_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_band_append", dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val drop1 = docs.filter(col("doc_id") % 10 === 0)
      val drop2 = docs.filter(col("doc_id") % 10 === 5)
      Dedup.saveBandIndex(Dedup.buildBandIndex(corpus, "doc_id", "text"), idxDir)
      Dedup.minHashLshProbe(Dedup.loadBandIndex(s, idxDir), drop1, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$idxDir/probe1")
      Dedup.appendBandIndex(s, idxDir, drop1, "doc_id", "text")
      s.read.parquet(s"$idxDir/probe1").unionByName(
        Dedup.minHashLshProbe(Dedup.loadBandIndex(s, idxDir), drop2,
          "doc_id", "text"))
    }),

    // Frame sampling over the opaque media payloads (the video-shaped
    // multimodal path): every stride-th 16-byte slice becomes a frame
    // row — the explode/partition shape a codec-backed sampler needs,
    // under the oracle via the deterministic demo payloads. Frames
    // output as hex STRINGS (catalog rule: no binary/array columns).
    "q113_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.demoMediaTable(t(s, dir, "documents")), stride = 2)
        .select(col("media_id"), col("frame_idx"),
          upper(hex(col("frame"))).as("frame_hex"))
    }),

    // Per-source quota cap (the domain-cap curation rule): keep at most
    // 50 docs per source by (token count desc, doc_id) — integer score,
    // bit-deterministic kept set — then per-source kept stats.
    "q114_source_quota" -> ((s, dir) => {
      Curation.sourceQuota(t(s, dir, "documents"), "source", "doc_id",
          TextAnalysis.tokenCount(col("text")), cap = 50)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("tokens_kept"))
    }),

    // Deterministic training-order shuffle: reproducible (shard,
    // position) per doc — engine-portable md5 order, one keyed shuffle,
    // no global sort. Full assignment emitted: the hash proves the
    // exact order, not just the shard sizes.
    "q115_train_order" -> ((s, dir) => {
      Curation.trainOrderShuffle(t(s, dir, "documents"), "doc_id",
          nShards = 16)
        .select(col("shard"), col("position"), col("doc_id"))
    }),

    // Bloom-gated incremental exact dedup: q80's anti-join semantics
    // executed through a Bloom-filter membership gate — the corpus's
    // fingerprints compress to a (word, bits) bitmap relation that
    // broadcasts to the batch probe; only bloom-positive keys touch the
    // corpus again (scan-side broadcast semi join — the corpus never
    // shuffles). The gate is LOSSLESS (no false negatives; positives
    // exact-verified), so the oracle is the plain anti join — same
    // "fancy plan, plain answer" pattern as q103's salted join.
    "q117_bloom_gated_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val newBatch = docs.filter(col("doc_id") % 7 === 0)
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      Dedup.bloomGatedAntiJoin(newBatch, corpus, "fp", mBits = 1L << 16)
        .select(col("doc_id"), col("lang"), col("fp"))
    }),

    // Stored-Bloom-filter lifecycle under the oracle: build the filter
    // over a seed corpus, APPEND a later ingest's keys as new files
    // (bitmaps merge by bitwise OR at load — existing files untouched),
    // then gate the probe batch against the full corpus through the
    // LOADED filter. Same lossless contract as q117, so the oracle is
    // again the plain anti join; what this row adds is the persisted
    // build → save → append → load → probe path (the q101/q112/q106
    // lifecycle story, for membership).
    "q118_bloom_index_probe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val batch = docs.filter(col("doc_id") % 9 === 0)
      val corpus = docs.filter(col("doc_id") % 9 =!= 0)
      val idxDir = scratchDir("graft_bloom_index", dir)
      Dedup.saveBloomIndex(Dedup.buildBloomIndex(
        corpus.filter(col("doc_id") % 9 <= 4), "fp", mBits = 1L << 16), idxDir)
      Dedup.appendBloomIndex(s, idxDir,
        corpus.filter(col("doc_id") % 9 >= 5), "fp")
      Dedup.bloomGatedAntiJoinIndexed(Dedup.loadBloomIndex(s, idxDir),
          batch, corpus, "fp")
        .select(col("doc_id"), col("lang"), col("fp"))
    }),

    // Persisted IVF-PQ lifecycle — the fourth stored-index family
    // completed (bands q112, IVF q106, Bloom q118, now PQ): build both
    // quantizers on the seed corpus and persist (codes partitioned by
    // cell + two tiny params tables), APPEND tonight's batch encoded
    // with the STORED codebooks (no retraining, existing files
    // untouched), then serve top-k from the loaded CODES ONLY — the
    // search path runs zero training jobs, which is what q116's
    // in-memory form couldn't claim. Oracle replays quantizers trained
    // on the corpus subset only.
    "q119_pq_index_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_pq_index", dir)
      Similarity.savePqIndex(
        Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      Similarity.appendPqIndex(s, idxDir,
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndex(s, idxDir), "vec_id", "embedding", k = 10)
    }),

    // Two-stage ANN serving (Jégou IVFADC+R): the PQ index ADC-ranks a
    // 50-candidate shortlist from codes alone, then ONLY those rows
    // fetch raw vectors back (broadcast shortlist → scan-side hash join;
    // the corpus never shuffles) for an exact cosine top-k. Recovers
    // the PQ coding loss: measured recall@10 matches plain IVF (0.655
    // at sf0.01) vs 0.295 for the raw ADC ranking of q116/q119.
    "q121_pq_refined_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqSearchRefined(emb.filter(col("vec_id") % 25 === 0),
        Similarity.buildPqIndex(emb, "vec_id", "embedding"), emb,
        "vec_id", "embedding", k = 10)
    }),

    // Streaming MEMBERSHIP ingest under the oracle — the Bloom twin of
    // q110's curation stream: two nightly drops land one file per
    // trigger, each micro-batch is gated by the STORED Bloom filter
    // (seeded over the corpus), admitted rows append their keys back to
    // the filter, so drop 2 dedups against corpus AND drop 1 with zero
    // corpus re-hashing. Output = the admitted fingerprint SET (fp is
    // arrival-order invariant; doc_id within an exact-dup group is not),
    // so the oracle is the plain "drop fps minus corpus fps".
    "q120_bloom_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_bloom_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
      }
      val bloomDir = s"$base/bloom$run"
      Dedup.saveBloomIndex(Dedup.buildBloomIndex(
        corpus.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
        "fp", mBits = 1L << 16), bloomDir)
      val q = graft.streaming.DocumentStreams.bloomIngest(s,
        landing.toString, bloomDir, corpus, s"$base/out$run",
        s"$base/ckpt$run", maxFilesPerTrigger = Some(1))
      q.processAllAvailable()
      q.stop()
      s.read.schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType))))
        .parquet(s"$base/out$run")
        .select(col("fp")).distinct()
    }),

    // Streaming NEAR-DUP ingest under the oracle — the band-family twin
    // of q120's membership gate: two drops land as separate triggers;
    // each is probed against the STORED corpus band index plus bands
    // re-derived from earlier committed drops, and only documents with
    // NO verified near-dup (jaccard >= 0.5) on the index side are
    // admitted — drop 2 near-dedups against corpus AND drop 1's admitted
    // rows. Admission is doc_id-deterministic (the gate depends only on
    // text), so the oracle replays the banding pair SQL and the two-step
    // admission in plain SQL.
    "q123_band_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_band_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/bands$run"
      Dedup.saveBandIndex(Dedup.buildBandIndex(corpus, "doc_id", "text"), idxDir)
      val q = graft.streaming.DocumentStreams.bandIngest(s,
        landing.toString, idxDir, s"$base/out$run", s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      s.read.schema(graft.streaming.DocumentStreams.documentsFileSchema)
        .parquet(s"$base/out$run")
        .select(col("doc_id"))
    }),

    // Robust per-source OUTLIER gate: flag documents whose token count
    // sits more than 2 MADs from the source median (the
    // median/MAD filter that survives the heavy tails a mean/stddev
    // gate is wrecked by). Interpolating percentile parity with DuckDB
    // is the q98-proven surface; the comparison stays in exact
    // integer-vs-double space (|x − med| vs 2·mad to avoid
    // engine-specific double literals).
    "q138_robust_outliers" -> ((s, dir) => {
      Curation.robustOutlierGate(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("tok")),
          "source", "tok", nMads = 2)
        .select(col("doc_id"), col("source"), col("tok"),
          col("med"), col("mad"))
    }),

    // Token-BUDGET mixture draw: from each source take documents in
    // md5-hash order until the source's 800-token budget fills — the
    // reproducible "draw N tokens per source" primitive behind mixture
    // construction (q92's weights decide budgets; this row executes a
    // draw). One window per source, no global sort.
    "q137_token_budget_mix" -> ((s, dir) => {
      Curation.tokenBudgetMix(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("tok")),
          "doc_id", "source", "tok", budgetTokens = 800L)
        .select(col("doc_id"), col("source"), col("tok"), col("cum_tok"))
    }),

    // SimHash-gated streaming ingest — the FOURTH gate family (exact
    // q110, membership q120, minhash near-dup q123, now simhash), and
    // the one whose probe is LOSSLESS: pigeonhole banding makes each
    // trigger's gate EQUAL the exact hamming filter, so the two-stage
    // admission oracle carries no recall caveat.
    "q136_simhash_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_simhash_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      Dedup.saveSimHashIndex(
        Dedup.buildSimHashIndex(corpus, "doc_id", "text", maxHamming = 6),
        idxDir)
      val q = graft.streaming.DocumentStreams.simhashIngest(s,
        landing.toString, idxDir, s"$base/out$run", s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      s.read.schema(graft.streaming.DocumentStreams.documentsFileSchema)
        .parquet(s"$base/out$run")
        .select(col("doc_id"))
    }),

    // ExactSubstr dup-span REMOVAL — the action behind q90's stats: cut
    // every token covered by an 8-gram that appears in more than one
    // document (the q50 prefix-dup clusters lose their shared prefixes;
    // unique tails survive), rebuild the cleaned text in order.
    "q135_strip_dup_spans" -> ((s, dir) => {
      Curation.stripDupSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 8, maxDf = 1)
    }),

    // MULTI-PROBE LSH ANN: q56's tables with each query also visiting
    // every Hamming-1 bucket — recall toward more-tables without
    // touching the corpus side (corpus bucketed once; the broadcast
    // query side fans out ×6). Candidates ⊇ q56's by construction.
    "q134_ann_lsh_multiprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKMultiProbe(emb.filter(col("vec_id") % 25 === 0),
        emb, "vec_id", "embedding", k = 10)
    }),

    // MEDIA near-dup: the multimodal pipeline feeding the similarity
    // machinery — decode (per-partition stub decoder, real plumbing) →
    // feature vectors → banded near-dup at dim 8. The demo payload is a
    // "thumbnail" derived from the doc's 8-token prefix (the q50
    // fingerprint surface), so shared-prefix docs carry identical
    // payloads and surface at cosine 1. The oracle replays the decoder's
    // digest-byte features through a generated float32-rounding lookup.
    "q133_media_neardup" -> ((s, dir) => {
      val thumbs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 8))
          .as("text"))
      val feats = Multimodal.extractFeatures(
        Multimodal.demoMediaTable(thumbs),
        new Multimodal.DeterministicStubDecoder(8))
      // MEAN-CENTER before sign-banding: stub features live in [0,1], and
      // sign planes barely split a positive-only point cloud (most planes
      // leave the whole quadrant on one side → mega-buckets). Centering
      // balances every cut; identical payloads still center identically,
      // so dup recall stays 1. nPlanes=10/nTables=2 sized for dup
      // detection (ANY shared bucket suffices for identical vectors).
      Similarity.nearDupPairsBanded(
        feats.select(col("media_id").as("vec_id"),
          transform(col("features"), x => x - lit(0.5f)).as("embedding")),
        "vec_id", "embedding", threshold = 0.999,
        nPlanes = 10, nTables = 2)
    }),

    // Count-min frequency sketch under the oracle: token occurrence
    // counts estimated from a 4×1024-integer relation instead of the
    // full vocabulary — estimates for the probe tokens (min over hash
    // rows, the ≥-true guarantee); mergeable by addition like q125.
    "q132_countmin_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = docs.select(explode(split(col("text"), " ")).as("token"))
      val probe = docs.filter(col("doc_id") % 250 === 3)
        .select(explode(split(col("text"), " ")).as("token")).distinct()
      Curation.cmEstimate(Curation.cmSketch(tok, "token"), probe, "token")
        .select(col("k").as("token"), col("est").as("est_count"))
    }),

    // INCREMENTAL connected components under the oracle — nightly
    // cluster state without a full recompute: the corpus's bulk labels
    // seed an append-only store; each drop contracts its new edges onto
    // the CURRENT labels (graph size = batch + touched components, never
    // the corpus), appends batch labels once and label-merge remaps;
    // the final view follows remap chains to fixpoint. Same answer as
    // q68's bulk recursive flood over everything — the lifecycle changes
    // the plan, never the labels.
    "q131_incremental_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = scratchDir("graft_label_store", dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val drop1 = docs.filter(col("doc_id") % 10 === 0)
      val drop2 = docs.filter(col("doc_id") % 10 === 5)
      // the two stored structures run the nightly pipeline TOGETHER: the
      // band index supplies each drop's cross pairs (corpus banded once,
      // probed and appended per drop — q112's lifecycle), the label
      // store folds them into cluster state incrementally
      val idxDir = s"$store/bands"
      val cache = new Dedup.CacheHandle()
      // ONE shingle+sign pass seeds both stores: the saved band index's
      // own bands/sets derive the corpus pairs (identical rows to
      // minHashLshPairs — same bands, same verify), instead of paying
      // the corpus md5/shingle pipeline once for the pairs and again
      // for the index
      val cIdx = Dedup.buildBandIndex(corpus, "doc_id", "text",
        cache = cache)
      Dedup.saveBandIndex(cIdx, idxDir)
      val cPairs = Dedup.minHashLshPairsFromIndex(cIdx)
        .select(col("id_a"), col("id_b"))
      Dedup.saveLabelStore(
        Dedup.connectedComponents(corpus.select(col("doc_id")), "doc_id",
          cPairs, upstream = cache), store)
      for (d <- Seq(drop1, drop2)) {
        // one shingle+sign pass per drop feeds both pair sides
        val dIdx = Dedup.buildBandIndex(d, "doc_id", "text", cache = cache)
        val within = Dedup.minHashLshPairsFromIndex(dIdx)
          .select(col("id_a"), col("id_b"))
        val across = Dedup.minHashLshProbeIndexed(
            Dedup.loadBandIndex(s, idxDir), dIdx)
          .select(col("id_a"), col("id_b"))
        // the handle forwards into the component flood: each drop's
        // shingle caches + resolved view are released the moment the
        // contracted edge cache is pinned, BEFORE the flood rounds
        Dedup.appendLabels(s, store, d.select(col("doc_id")), "doc_id",
          within.unionByName(across), upstream = cache)
        Dedup.appendBandIndex(s, idxDir, d, "doc_id", "text")
      }
      cache.release() // every append wrote; shingle caches are dead
      Dedup.resolveLabels(s, store)
        .select(col("id").as("doc_id"), col("component"))
    }),

    // DELETE lifecycle for the CLUSTER-STATE store: bulk-seed the label
    // store from the corpus flood, DELETE doc_id % 9 == 4 (one append
    // of bare ids), resolve — tombstoned ids leave every resolved view
    // before the chain chase. Components do NOT re-split on delete
    // (decremental connectivity needs the edge set the store
    // deliberately drops; offline rebuild recovers splits) and a
    // deleted id may persist as an opaque LABEL value — the oracle is
    // the full-graph flood with MEMBERSHIP restricted to survivors,
    // which is exactly those semantics.
    "q162_label_delete" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = scratchDir("graft_label_delete", dir)
      val cache = new Dedup.CacheHandle()
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          cache = cache)
        .select(col("id_a"), col("id_b"))
      Dedup.saveLabelStore(
        Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id",
          pairs, upstream = cache), store)
      Dedup.deleteFromLabelStore(s, store,
        docs.filter(col("doc_id") % 9 === 4).select("doc_id"), "doc_id")
      Dedup.resolveLabels(s, store)
        .select(col("id").as("doc_id"), col("component"))
    }),

    // INCREMENTAL connected components run as a STREAM — q131's nightly
    // lifecycle with the drops arriving through a real file-source
    // query: the corpus seeds bulk labels + the band index ONCE; each
    // drop's micro-batch probes the stored index (plus earlier drops'
    // committed docs re-banded), folds its edges into cluster state by
    // writing label/remap deltas to its OWN batch partitions
    // (replay-idempotent: re-execution rewrites identical rows), and
    // the final view resolves seed ∪ committed deltas. Same labels as
    // q131's batch loop on the same drops — the q131 bulk-flood oracle
    // checks exactly that.
    "q140_label_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val base = scratchDir("graft_label_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val store = s"$base/store$run"
      val idxDir = s"$base/bands$run"
      val cache = new Dedup.CacheHandle()
      // one shingle+sign pass seeds both stores (the q131 seed idiom)
      val cIdx = Dedup.buildBandIndex(corpus, "doc_id", "text",
        cache = cache)
      Dedup.saveBandIndex(cIdx, idxDir)
      val cPairs = Dedup.minHashLshPairsFromIndex(cIdx)
        .select(col("id_a"), col("id_b"))
      Dedup.saveLabelStore(
        Dedup.connectedComponents(corpus.select(col("doc_id")), "doc_id",
          cPairs, upstream = cache), store)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.labelIngest(s,
        landing.toString, idxDir, store, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 5).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 10 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      graft.streaming.DocumentStreams.resolvedStreamLabels(s, store, out)
        .select(col("id").as("doc_id"), col("component"))
    }),

    // Incremental statistics under the oracle: the corpus seeds one
    // sketch partition batch-side, two drops stream their own sketch
    // partitions, and the reported quantiles come from SUMMING the
    // committed partitions — no document is ever re-read. Same
    // arithmetic as q125, different lifecycle (batch + streamed state).
    "q130_sketch_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_sketch_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val outPath = s"$base/out$run"
      // corpus partition written batch-side (the backfill)
      Curation.logHistSketch(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select(col("lang"),
              TextAnalysis.tokenCount(col("text")).cast("long").as("tok")),
          Seq("lang"), "tok")
        .write.mode("overwrite").parquet(s"$outPath/batch_id=-1")
      val q = graft.streaming.DocumentStreams.sketchIngest(s,
        landing.toString, outPath, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      Curation.logHistQuantiles(
        graft.streaming.DocumentStreams.loadSketch(s, outPath),
        Seq("lang"), Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)))
    }),

    // FILTERED vector search: PQ top-k restricted by a metadata
    // predicate applied to the stored CODES before ADC scoring — the
    // top-k ranks allowed candidates only (a post-filtered k-limited
    // result would come up short), and on a loaded index the predicate
    // lands in the codes parquet scan as a pushed filter.
    "q129_pq_filtered_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.buildPqIndex(emb, "vec_id", "embedding"),
        "vec_id", "embedding", k = 10,
        corpusFilter = Some(col("neighbor_id") % 2 === 0))
    }),

    // BM25 full-text retrieval: top-10 docs per query over an inverted
    // index, scored in EXACT integer micro-units (BIGINT A/B products,
    // one IEEE division per term, integer sum — engine-reproducible;
    // the q76 fixed-point idiom extended to the full Okapi formula).
    // Queries: every doc_id % 200 == 7 doc queries with its own first
    // 4 distinct tokens. df is only counted for queried tokens; the
    // query side broadcasts.
    "q124_bm25_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25TopK(docs, queries,
        "doc_id", "text", "qid", "qterms", k = 10)
    }),

    // Persisted BM25 inverted index — the SIXTH stored-index lifecycle
    // (bands q112, IVF q106, Bloom q118, PQ q119, simhash q122, now
    // postings): the corpus's postings are built ONCE (the one
    // token-stream shuffle) and saved partitioned by token-hash bucket
    // plus ADDITIVE (n, t) stats delta rows; tonight's drop appends its
    // own postings as NEW files (only the batch is tokenized); serve
    // answers q124's queries from the LOADED postings with zero
    // postings-build jobs — the scan prunes to the query terms' buckets
    // (partition pruning on bucket literals) and live (N, T) is the sum
    // of the stats deltas. Index corpus = all documents ⇒ identical
    // rows to q124, which is exactly what the oracle checks.
    "q139_bm25_index_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_index", dir)
      graft.operators.Retrieval.savePostingsIndex(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPostingsIndex(s, idxDir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndex(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // DELETE lifecycle for the postings index — the LSM tombstone path
    // every 100 TB store eventually needs (GDPR/right-to-be-forgotten):
    // build + append as q139, then DELETE doc_id % 7 == 3 — ONE append
    // write of (doc_id, dl) tombstone rows, committed postings files
    // untouched — and delete them AGAIN (idempotence exercised under
    // the oracle: the second call appends nothing). Serve anti-joins
    // the tombstones lazily and shrinks live (N, T) by the tombstones'
    // (count, Σdl), so scores re-rank exactly as if the corpus never
    // held those docs — which is exactly what the oracle computes.
    // Queries keep the full q124 query set (a deleted doc may still
    // QUERY; it can never be RETURNED).
    "q158_bm25_delete_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_delete", dir)
      graft.operators.Retrieval.savePostingsIndex(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPostingsIndex(s, idxDir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      graft.operators.Retrieval.deleteFromPostingsIndex(s, idxDir,
        victims, "doc_id")
      graft.operators.Retrieval.deleteFromPostingsIndex(s, idxDir,
        victims, "doc_id")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndex(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // SNAPSHOT-manifest serve — reader isolation for the stored index
    // (the minimum of the Iceberg/Delta commit idea): every committed
    // batch appends ONE manifest row-file listing its data files AFTER
    // the data lands, and a snapshot load reads exactly the union of
    // manifested files. Here the seed and one append COMMIT, then a
    // TORN batch (% 20 == 10) lands data files with NO manifest row —
    // a crashed writer mid-append. The snapshot serve never sees it:
    // scores equal a corpus that excludes the torn docs, which is what
    // the oracle computes. (A plain directory load WOULD see the torn
    // files — that contrast is spec-pinned in ManifestSpec.)
    "q163_bm25_snapshot_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_snapshot", dir)
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
      // the torn writer: data files land, the manifest row never does
      graft.operators.Retrieval.appendPostingsIndex(s, idxDir,
        docs.filter(col("doc_id") % 20 === 10), "doc_id", "text")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // TIME TRAVEL + optimistic concurrency on the manifested store —
    // the rest of the commit-log surface q163 opened. Generations: save
    // commits gen 0 (seed), two appends commit gens 1 and 2 (each
    // OCC-guarded with the generation its writer read — both win). A
    // THIRD writer re-uses the stale gen-0 expectation: its data files
    // land but its commit is REFUSED (the OCC loser), and vacuum
    // physically reclaims exactly those orphans. The serve then reads
    // AS OF generation 0 — the index as it stood after the save — so
    // scores equal the seed-only corpus, which is what the oracle
    // computes. (Deletes would apply even to historical reads — the
    // ledger is unversioned by design, right-to-be-forgotten; that
    // composition is ManifestSpec-pinned.)
    "q164_bm25_time_travel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_timetravel", dir)
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val g0 = graft.operators.Retrieval.postingsGen(s, idxDir)
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
        expectedGen = Some(g0))
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 20 === 10), "doc_id", "text",
        expectedGen = Some(g0 + 1))
      // the OCC loser: read gen 0 long ago, appends now — data files
      // land, the commit refuses, no snapshot ever sees them
      val lost = scala.util.Try(
        graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
          docs.filter(col("doc_id") % 20 === 10), "doc_id", "text",
          expectedGen = Some(g0)))
      require(lost.isFailure, "stale optimistic commit must refuse")
      require(graft.operators.Retrieval.vacuumPostingsIndex(s, idxDir)
        .nonEmpty, "the lost commit's orphans must be reclaimable")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir,
          asOf = Some(0L)),
        "qid", "qterms", k = 10)
    }),

    // Snapshot-manifest commits on the VECTOR index — the commit log
    // generalized off the postings family (shared StoreFiles manifest
    // machinery) onto the family whose serving path matters most: a
    // reader listing the codes directory mid-append would ADC-score a
    // torn batch. Committed save (gen 0) + one OCC-guarded committed
    // append, then a TORN append (crashed writer: code files land, no
    // manifest row). The snapshot serve never sees the torn vectors —
    // scores equal a corpus that excludes them, which is what the
    // oracle computes (quantizers still trained on the seed only, the
    // q119 split).
    "q165_pq_snapshot_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_pq_snapshot", dir)
      Similarity.savePqIndexCommitted(
        Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      Similarity.appendPqIndexCommitted(s, idxDir,
        emb.filter(col("vec_id") % 20 === 0), "vec_id", "embedding",
        expectedGen = Some(Similarity.pqGen(s, idxDir)))
      // the torn writer: data files land, the manifest row never does
      Similarity.appendPqIndex(s, idxDir,
        emb.filter(col("vec_id") % 20 === 10), "vec_id", "embedding")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndexSnapshot(s, idxDir),
        "vec_id", "embedding", k = 10)
    }),

    // Pseudo-relevance-feedback QUERY EXPANSION (Rocchio-weighted RM3
    // reading): round 1 ranks the original terms, each query's top-10
    // docs donate their most-frequent unseen tokens (summed-tf weight,
    // exact integer) as 5 expansion terms, and round 2 rescores with
    // 10:4 original:expansion weights. One postings build serves both
    // rounds; query/expansion sides broadcast throughout; df only
    // counted for queried tokens. The retrieval-quality op a raw BM25
    // box is missing — vocabulary-mismatch queries recall docs that
    // share no original term.
    "q166_bm25_expand" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25Expand(docs, queries,
        "doc_id", "text", "qid", "qterms",
        k = 10, fbDocs = 10, fbTerms = 5,
        origWeight = 10L, expWeight = 4L)
    }),

    // Distribution-DRIFT monitor — the nightly data-quality alarm of a
    // multi-source ingest: each source's hashed-token histogram (64
    // md5 buckets, the DSIR feature idea) vs the corpus baseline by
    // total variation distance — PURE integer division, not one IEEE
    // op, engine- and partitioning-exact. A source whose crawl
    // behavior, encoding, or spam mix shifts rises with no model in
    // the loop. One token-stream aggregation; the histograms are tiny.
    "q185_source_drift" -> ((s, dir) => {
      Curation.bucketDriftTvd(t(s, dir, "documents"), "text", "source")
    }),

    // THE SERVING STACK in one row — what a production search system
    // actually executes per query batch, every stage already proven
    // alone: the text run serves from the STORED postings index (q139's
    // zero-build serve), the vector run from IVF cell routing (q57),
    // the two fuse by reciprocal rank (q178), and MMR diversifies the
    // fused page (q182). End-to-end integer-exact; the oracle composes
    // the same mirrors (fused CTEs feeding the unrolled MMR steps).
    "q184_search_stack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_stack_postings", dir)
      graft.operators.Retrieval.savePostingsIndex(
        graft.operators.Retrieval.buildPostingsIndex(docs,
          "doc_id", "text"), idxDir)
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      val textRun = graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndex(s, idxDir),
        "qid", "qterms", k = 10).localCheckpoint()
      val vecRun = Similarity.ivfTopK(
          emb.filter(col("vec_id") % 200 === 7), emb,
          "vec_id", "embedding", k = 10)
        .select(col("query_id").as("qid"),
          col("neighbor_id").as("doc_id"), col("rank").as("rn"))
        .localCheckpoint()
      graft.operators.Retrieval.mmrRerank(
        graft.operators.Retrieval.rrfFuse(Seq(textRun, vecRun), k = 10),
        emb, "vec_id", "embedding", k = 5, lambdaTenths = 7)
    }),

    // HARD-NEGATIVE mining (the DPR BM25-negatives recipe, Karpukhin
    // et al. EMNLP'20): from each query's BM25 top-10, keep the docs
    // whose embedding cosine to the query is below 0.35 — lexically
    // plausible, semantically far, the contrastive pairs a dense
    // retriever trains on. Cosine is the floor-micro quantized form
    // (engine-hash-matched); self-pairs dropped.
    "q183_hard_negatives" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.hardNegatives(
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint(),
        t(s, dir, "embeddings"), "vec_id", "embedding",
        simThresholdMicro = 350000L)
    }),

    // MMR diversified re-rank (Carbonell & Goldstein SIGIR'98) — the
    // anti-redundancy pass: from each query's BM25 top-10, greedily
    // pick 5 maximizing λ·relevance − (1−λ)·max-similarity-to-selected
    // (λ = 0.7; rank-linear relevance, floor-micro quantized-cosine
    // similarity over the docs' embeddings, doc_id ties). The greedy
    // loop unrolls into 5 relational steps — one ranking window each
    // over ≤10 rows/query — no driver iteration, no UDFs; the oracle
    // unrolls the same 5 steps as chained CTEs.
    "q182_mmr_rerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.mmrRerank(
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10),
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, lambdaTenths = 7)
    }),

    // KWIC SNIPPETS — the display pass after ranking: each BM25 hit
    // gets the ±3-token window around the earliest occurrence of any
    // query term (min position over terms — deterministic), rebuilt as
    // text. The positional stream joins broadcast terms and hits, one
    // min per hit, then the tiny per-hit relation broadcasts back onto
    // a second corpus scan for the token-array slice — the corpus
    // never shuffles.
    "q180_kwic_snippets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.kwicSnippets(
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint(),
        docs, queries, "doc_id", "text", "qid", "qterms", window = 3)
    }),

    // Search-time RESULT DEDUP — the SERP-dedup pass every production
    // search runs: the fixture corpus contains shared-prefix near-dups
    // by construction (q82's clusters), and ranking by a doc's own
    // leading tokens surfaces them together — so within each result
    // list, hits sharing the 8-word prefix fingerprint keep only their
    // best-ranked copy and survivors re-rank densely (one suppression
    // fires at sf0.01). Two windows over 10-row-per-query lists; the
    // corpus is touched only for the signature join.
    "q179_result_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.dedupResults(
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint(),
        docs.select(col("doc_id"),
          TextAnalysis.prefixFingerprint(col("text"), 8).as("sig")))
    }),

    // HYBRID retrieval — BM25 ∪ vector ANN fused by RECIPROCAL RANK
    // FUSION (Cormack et al. SIGIR'09), the modern hybrid-search
    // default (no score calibration between runs, only ranks): the
    // text run is q124's BM25, the vector run is q57's IVF with the
    // SAME query ids (vec_id ≡ doc_id — the embeddings of the
    // documents), and the fused score is Σ 1e6 DIV (60 + rank) — pure
    // integer division, engine-exact. Docs that both modalities like
    // float to the top; either alone can still surface a hit.
    "q178_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      val textRun = graft.operators.Retrieval.bm25TopK(docs, queries,
        "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint()
      val vecRun = Similarity.ivfTopK(
          emb.filter(col("vec_id") % 200 === 7), emb,
          "vec_id", "embedding", k = 10)
        .select(col("query_id").as("qid"),
          col("neighbor_id").as("doc_id"), col("rank").as("rn"))
      graft.operators.Retrieval.rrfFuse(Seq(textRun, vecRun), k = 10)
    }),

    // Ranking-AGREEMENT eval — the offline metric a ranker change ships
    // with: how far does pseudo-relevance expansion (q166) move the
    // plain BM25 ranking (q124)? Per query: overlap@10 and the L1 rank
    // displacement over the common docs, exact integers. One join +
    // one aggregation over the two runs.
    "q177_rank_agreement" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.rankAgreement(
        graft.operators.Retrieval.bm25TopK(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint(),
        graft.operators.Retrieval.bm25Expand(docs, queries,
          "doc_id", "text", "qid", "qterms", k = 10).localCheckpoint())
    }),

    // POSITIONAL exact-phrase search: every (phrase, doc) pair where
    // the 3-token phrase occurs consecutively, with the overlapping-
    // inclusive occurrence count. One broadcast equi-join on token +
    // one aggregation — the corpus's positional token stream never
    // shuffles; only matched rows do. Phrases: tokens 3-5 of every
    // doc_id % 2000 == 11 document (each source doc matches itself,
    // so the result is never vacuous).
    "q167_phrase_match" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val phrases = docs
        .filter(col("doc_id") % 2000 === 11 &&
          size(split(col("text"), " ")) >= 5)
        .select(col("doc_id").as("pid"),
          slice(split(col("text"), " "), 3, 3).as("pterms"))
      graft.operators.Retrieval.phraseMatch(docs, phrases,
        "doc_id", "text", "pid", "pterms")
    }),

    // Exact-integer PCA — dimensionality reduction ahead of indexing
    // (the PCA-before-PQ step of Jégou et al.; SemDeDup projects before
    // clustering). Fit = ONE distributed pass of exact integer moments
    // (d(d+1)/2 upper-triangle sums, ~2k-row shuffle regardless of
    // corpus size) + a driver-side deterministic Jacobi eigensolve;
    // the milli mean and micro basis then travel as LITERALS, so the
    // data-touching projection is an exact integer dot product both
    // engines reproduce bit-for-bit (the trained-centroid idiom).
    // Output: every vector's 8 principal coordinates.
    "q168_pca_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Pca.project(emb, "vec_id", "embedding",
        graft.operators.Pca.fit(emb, "embedding", r = 8))
    }),

    // ROLLUP — the multi-level aggregation surface (GROUPING SETS
    // family): per-(flag, status) totals, per-flag subtotals, and the
    // grand total in ONE pass (Spark plans a single Expand + aggregate,
    // not three scans). grouping_id disambiguates rolled-up NULLs from
    // data NULLs; money in exact cents, quantities as exact longs.
    "q171_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          grouping_id().cast("int").as("gid"))
    }),

    // PIVOT — long-to-wide reshape with a PINNED value list (an
    // inferred list would make the schema data-dependent): order counts
    // per status × priority, absent cells as explicit zeros. One
    // aggregation pass; the five output columns are conditional counts.
    "q172_pivot" -> ((s, dir) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
      prios.zipWithIndex.foldLeft(wide) { case (df, (p, i)) =>
        df.withColumn(s"p${i + 1}", coalesce(col(s"`$p`"), lit(0L)))
          .drop(p)
      }
    }),

    // PERSISTED POSITIONAL index — the stored lifecycle behind q167
    // (phrase/proximity queries need per-OCCURRENCE postings, which the
    // q139 index's (doc, token, tf) rows can't answer): build the
    // positional stream once (zero shuffles — the position rides the
    // explode), save partitioned by token-hash bucket, append tonight's
    // drop (only the batch tokenizes, new files only), then serve the
    // q167 phrase set from the LOADED index — the scan prunes to the
    // phrase terms' bucket partitions and the corpus is never
    // re-tokenized. Index corpus = all documents ⇒ identical rows to
    // q167, which is what the oracle checks.
    "q170_phrase_index_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_positional_index", dir)
      graft.operators.Retrieval.savePositionalIndex(
        graft.operators.Retrieval.buildPositionalIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPositionalIndex(s, idxDir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      val phrases = docs
        .filter(col("doc_id") % 2000 === 11 &&
          size(split(col("text"), " ")) >= 5)
        .select(col("doc_id").as("pid"),
          slice(split(col("text"), " "), 3, 3).as("pterms"))
      graft.operators.Retrieval.phraseSearchIndex(phrases,
        graft.operators.Retrieval.loadPositionalIndex(s, idxDir),
        "pid", "pterms")
    }),

    // DELETE lifecycle for the positional index — the simplest
    // tombstone shape (no corpus-total stats to adjust): build + append
    // as q170, DELETE doc_id % 7 == 3 twice (idempotence under the
    // oracle — the second call appends nothing), serve the q167 phrase
    // set. Deleted docs can never match; a deleted doc may still QUERY
    // (phrases come from the unrestricted set). Oracle: the phrase
    // mirror with the corpus side restricted to survivors.
    "q173_phrase_delete_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_positional_delete", dir)
      graft.operators.Retrieval.savePositionalIndex(
        graft.operators.Retrieval.buildPositionalIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPositionalIndex(s, idxDir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      val victims = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
      graft.operators.Retrieval.deleteFromPositionalIndex(s, idxDir,
        victims, "doc_id")
      graft.operators.Retrieval.deleteFromPositionalIndex(s, idxDir,
        victims, "doc_id")
      val phrases = docs
        .filter(col("doc_id") % 2000 === 11 &&
          size(split(col("text"), " ")) >= 5)
        .select(col("doc_id").as("pid"),
          slice(split(col("text"), " "), 3, 3).as("pterms"))
      graft.operators.Retrieval.phraseSearchIndex(phrases,
        graft.operators.Retrieval.loadPositionalIndex(s, idxDir),
        "pid", "pterms")
    }),

    // Streaming POSITIONAL-index maintenance — q170's family kept live
    // by a stream (the q142 shape on per-occurrence rows): seed the
    // stored index batch-side, stream two drops (each writes only its
    // own positional rows to its batch partition, stateless ⇒
    // replay-idempotent), serve the q167 phrase set over seed ∪
    // committed deltas with zero corpus-tokenize jobs. Full corpus
    // covered ⇒ identical rows to q167/q170, the shared oracle.
    "q175_phrase_stream_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_positional_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      graft.operators.Retrieval.savePositionalIndex(
        graft.operators.Retrieval.buildPositionalIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.positionalIngest(s,
        landing.toString, idxDir, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      val phrases = docs
        .filter(col("doc_id") % 2000 === 11 &&
          size(split(col("text"), " ")) >= 5)
        .select(col("doc_id").as("pid"),
          slice(split(col("text"), " "), 3, 3).as("pterms"))
      graft.operators.Retrieval.phraseSearchIndex(phrases,
        graft.streaming.DocumentStreams.livePositionalIndex(s, idxDir, out),
        "pid", "pterms")
    }),

    // Streaming MODEL-STATISTICS maintenance — PCA's sufficient
    // statistics kept live (the q130 additive-state idiom on a model):
    // the seed corpus's exact-integer moment relation lands batch-side,
    // two embedding drops stream in writing only their own moment rows
    // (stateless ⇒ replay-idempotent), and the serve eigensolves the
    // MERGED moments (one driver Jacobi, zero vector re-reads) and
    // projects the full corpus. Seed ∪ drops = the full table and
    // moments merge by exact integer sum, so the fitted basis — and
    // every projection — is bit-identical to q168's batch fit, which
    // is what the shared oracle checks.
    "q176_pca_stream_fit" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = scratchDir("graft_moments_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val seedPath = s"$base/seed$run"
      graft.operators.Pca.momentsOf(
          emb.filter(col("vec_id") % 10 =!= 0), "embedding")
        .write.mode("overwrite").parquet(seedPath)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.momentsIngest(s,
        landing.toString, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        emb.filter(col("vec_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      graft.operators.Pca.project(emb, "vec_id", "embedding",
        graft.operators.Pca.fitFromMoments(
          graft.streaming.DocumentStreams.liveMoments(s, seedPath, out),
          r = 8))
    }),

    // DoReMi-STYLE domain reweighting (Xie et al. 2023 on the engine's
    // own proxy signal): each source's mixture weight is its doc share
    // multiplicatively boosted by exp(η · excess bigram surprisal) —
    // high-surprisal (hard/rare) domains sample UP, boilerplate down.
    // The per-source stats are exact integers in-engine (the q146
    // machinery rolled up by source); the exp runs once on the driver
    // and the micro weights join as literals (the DSIR pattern). Output
    // is the stats + weight relation a sampler consumes.
    "q174_doremi_weights" -> ((s, dir) => {
      Curation.doremiWeights(t(s, dir, "documents"),
        "doc_id", "text", "source", eta = 1.0)
    }),

    // TEMPERATURE-scaled language mix (Lample & Conneau's p_i ∝ n_i^α,
    // the mC4/XLM-R up-sample-the-tail rule) at α = 0.5 over a
    // 300-doc budget: quotas are driver StrictMath literals over the
    // bounded per-lang count relation (pow never runs in an engine),
    // the draw is one md5-order ranking window per lang. The en head
    // gets a SMALLER share than its corpus share, tail langs larger —
    // without flattening the distribution.
    "q169_temperature_mix" -> ((s, dir) => {
      Curation.temperatureMix(t(s, dir, "documents"),
        "doc_id", "lang", alpha = 0.5, budget = 300L)
        .select(col("doc_id"), col("lang"), col("source"), col("pos"))
    }),

    // DELETE lifecycle for the PQ index — same tombstone idiom on the
    // vector side: build on the seed, append the drift batch (stored
    // codebooks), DELETE vec_id % 7 == 3 (one append of tombstoned
    // neighbor_ids; no stats to adjust — ADC has no corpus-total term),
    // then serve q119's queries. Deleted vectors can never be returned;
    // ranks close over the survivors. Oracle: q119's mirror with the
    // corpus CTE restricted to the survivors.
    "q159_pq_delete_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_pq_delete", dir)
      Similarity.savePqIndex(
        Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      Similarity.appendPqIndex(s, idxDir,
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding")
      Similarity.deleteFromPqIndex(s, idxDir,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndex(s, idxDir), "vec_id", "embedding", k = 10)
    }),

    // DELETE lifecycle on a DEDUP GATE — where tombstones are
    // load-bearing beyond storage: after a right-to-be-forgotten
    // delete, a future near-duplicate of the deleted doc MUST be
    // admitted, so the tombstoned corpus ids may no longer produce
    // candidate pairs. Build+save the band index, DELETE corpus ids
    // % 7 == 3 (one append of bare ids; band/sets files untouched),
    // probe tonight's drop: the verified pairs are exactly the full
    // pair set minus pairs whose corpus side was deleted — which is
    // what the oracle computes. (Bloom needs NO tombstones for this:
    // its confirm relation is the source of truth — documented at the
    // Bloom section head.)
    "q160_band_delete_probe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_band_delete", dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val drop = docs.filter(col("doc_id") % 10 === 0)
      Dedup.saveBandIndex(Dedup.buildBandIndex(corpus, "doc_id", "text"),
        idxDir)
      Dedup.deleteFromBandIndex(s, idxDir,
        corpus.filter(col("doc_id") % 7 === 3).select("doc_id"), "doc_id")
      Dedup.minHashLshProbe(Dedup.loadBandIndex(s, idxDir), drop,
        "doc_id", "text")
    }),

    // Streaming RETRIEVAL maintenance — q139's postings index kept live
    // by a stream (the 5th stored family with a streaming twin): the
    // corpus seeds the stored index batch-side, two drops stream in and
    // each writes ONLY ITS OWN postings + one-row stats delta to its
    // batch partition (stateless per drop → replay-idempotent with no
    // exclusions); serve answers q124's queries over seed ∪ committed
    // deltas with zero corpus-tokenize jobs. Full corpus indexed ⇒
    // identical rows to q124/q139, which is what the oracle checks.
    "q142_bm25_stream_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_postings_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      graft.operators.Retrieval.savePostingsIndex(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.postingsIngest(s,
        landing.toString, idxDir, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.streaming.DocumentStreams.livePostingsIndex(s, idxDir, out),
        "qid", "qterms", k = 10)
    }),

    // L0 → base ABSORB, end-to-end under the oracle: q142's streamed
    // postings deltas are PROMOTED into the stored index
    // (absorbPostingsDeltas — same write path as the batch append, then
    // the sink and checkpoint are cleared) and the serve runs from the
    // STORE ALONE (loadPostingsIndex, not the live view). Identical
    // rows to q124/q139/q142 ⇒ same oracle: the promotion moved the
    // deltas without changing a single posting.
    "q152_bm25_absorb_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_postings_absorb", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      graft.operators.Retrieval.savePostingsIndex(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val out = s"$base/out$run"
      val ckpt = s"$base/ckpt$run"
      val q = graft.streaming.DocumentStreams.postingsIngest(s,
        landing.toString, idxDir, out, ckpt, maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      graft.streaming.DocumentStreams.absorbPostingsDeltas(s, idxDir, out, ckpt)
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndex(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // Incremental MATERIALIZED AGGREGATE — the eighth stored-state
    // family (operators/MatView.scala): per-(lang, source) token stats
    // maintained as mergeable partial-aggregate DELTA rows. The corpus
    // seeds the state with its one scan; two nightly drops append ONLY
    // their own partials as new files; serve merges the deltas (sum of
    // counts/sums, min of mins, max of maxs, mean DERIVED as the exact
    // integer ratio) with zero corpus re-reads. Oracle: the plain
    // GROUP BY over everything — which is exactly the claim.
    "q143_incremental_agg" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      val mvDir = scratchDir("graft_matview", dir)
      graft.operators.MatView.saveAggState(
        graft.operators.MatView.buildAggState(
          docs.filter(col("doc_id") % 10 =!= 0), Seq("lang", "source"), "tok"),
        mvDir)
      graft.operators.MatView.appendAggState(s, mvDir,
        docs.filter(col("doc_id") % 20 === 0))
      graft.operators.MatView.appendAggState(s, mvDir,
        docs.filter(col("doc_id") % 20 === 10))
      graft.operators.MatView.serveAgg(
        graft.operators.MatView.loadAggState(s, mvDir))
    }),

    // DELETE lifecycle for the aggregate store — RETRACTION rows (the
    // classic incremental-view-maintenance move): the deleted slice
    // lands as negative (cnt, sum) deltas with null extremes — counts,
    // sums, and the derived mean are exact IMMEDIATELY; min/max (which
    // cannot retract — a min only widens) are repaired by
    // refreshExtremes, which recomputes extremes for TOUCHED KEYS ONLY
    // from the surviving corpus and squashes their delta piles. The
    // serve must equal the from-scratch aggregate over the survivors —
    // which is what the oracle computes.
    "q181_agg_retract_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("tok", size(split(col("text"), " ")).cast("long"))
      val mvDir = scratchDir("graft_matview_retract", dir)
      graft.operators.MatView.saveAggState(
        graft.operators.MatView.buildAggState(
          docs.filter(col("doc_id") % 10 =!= 0), Seq("lang", "source"), "tok"),
        mvDir)
      graft.operators.MatView.appendAggState(s, mvDir,
        docs.filter(col("doc_id") % 20 === 0))
      graft.operators.MatView.appendAggState(s, mvDir,
        docs.filter(col("doc_id") % 20 === 10))
      val survivors = docs.filter(col("doc_id") % 7 =!= 3)
      graft.operators.MatView.retractAggState(s, mvDir,
        docs.filter(col("doc_id") % 7 === 3))
      graft.operators.MatView.refreshExtremes(s, mvDir, survivors)
      graft.operators.MatView.serveAgg(
        graft.operators.MatView.loadAggState(s, mvDir))
    }),

    // KMV SET ALGEBRA — pairwise source-overlap audit from sketches
    // alone (which sources share 3-gram content, estimated WITHOUT an
    // all-pairs document comparison): each source's shingle set reduces
    // to its k smallest md5 hashes (Curation.kmvSketch, ≤ k rows per
    // source); kmvJaccard then estimates |A∩B|/|A∪B| for every source
    // pair from the sketch rows only — U = k-min of the sketch union
    // (itself a valid union sketch), estimate = fraction of U present
    // on both sides (Beyer et al. SIGMOD'07), exact integer ratio. The
    // pair relation comes from the driver-bounded group list (20
    // sources → 190 pairs) and joins sketches by EQUALITY — no cross
    // product. The oracle replays every hash, rank, and division.
    "q144_kmv_source_overlap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sh = docs.select(col("source"),
        explode(TextAnalysis.wordNGrams(col("text"), 3)).as("shingle"))
      graft.operators.Curation.kmvJaccard(
          graft.operators.Curation.kmvSketch(sh, Seq("source"),
            col("shingle"), 128),
          "source", 128)
        .select(col("g_a").as("src_a"), col("g_b").as("src_b"),
          col("u_n"), col("inter_n"), col("jaccard_micro"))
    }),

    // EDIT-DISTANCE near-dup pairs (the character-level dedup member —
    // typo/OCR-noise duplicates that token-set similarity misses):
    // document heads (first 5 tokens) within Levenshtein distance 3,
    // found via the LOSSLESS q-gram count filter (operators/
    // EditDist.scala: ed ≤ d ⇒ shared-gram bag ≥ max(len)−q+1−d·q) —
    // an inverted 2-gram index join + count filter prunes to
    // candidates, only survivors pay the exact levenshtein. The oracle
    // is the naive all-pairs form, which is the losslessness claim.
    "q145_editdist_neardup" -> ((s, dir) => {
      val heads = t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("head"))
      graft.operators.EditDist.editDistancePairs(heads, "doc_id", "head",
        maxDist = 3, q = 2)
    }),

    // BIGRAM SURPRISAL quality score — the model-based (perplexity)
    // filter signal with NO transcendentals: train bigram counts on
    // the corpus, score each doc by mean −log₂ p(w₂|w₁) where the log
    // is the binary-string length both engines compute identically
    // (length(bin(x)), the logHistSketch idiom) — high mean = rare/
    // garbled text, low mean = boilerplate, integer-exact throughout.
    "q146_bigram_surprisal" -> ((s, dir) =>
      graft.operators.Curation.bigramSurprisal(
        t(s, dir, "documents"), "doc_id", "text")),

    // Streaming AGGREGATE maintenance — q143's materialized aggregate
    // kept live by a stream (the 6th streaming twin): the corpus seeds
    // the stored state, two drops each write ONLY their own partial-
    // aggregate delta rows to their batch partitions (stateless ⇒
    // replay-idempotent), and the serve merges seed ∪ deltas with zero
    // corpus re-reads. Full corpus covered ⇒ identical rows to q143's
    // oracle (the plain GROUP BY over everything).
    "q148_agg_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_agg_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val mvDir = s"$base/mv$run"
      graft.operators.MatView.saveAggState(
        graft.operators.MatView.buildAggState(
          docs.filter(col("doc_id") % 10 =!= 0)
            .withColumn("tok", size(split(col("text"), " ")).cast("long")),
          Seq("lang", "source"), "tok"),
        mvDir)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.aggIngest(s,
        landing.toString, mvDir, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      graft.operators.MatView.serveAgg(
        graft.streaming.DocumentStreams.liveAggState(s, mvDir, out))
    }),

    // Streaming IVF maintenance — q106's index kept live by a stream
    // (the plain-IVF sibling of q150: assignments keep the quantized
    // vector, serve is exact cosine in probed cells): drops assign to
    // the STORED centroids (no retrain) into their own batch
    // partitions; serve = q106's search over stored ∪ streamed
    // assignments. Same train/search split as q106 ⇒ same oracle.
    "q151_ivf_stream_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = scratchDir("graft_ivf_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      Similarity.saveIvfIndex(
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.ivfIngest(s,
        landing.toString, idxDir, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        emb.filter(col("vec_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      Similarity.ivfSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        graft.streaming.DocumentStreams.liveIvfIndex(s, idxDir, out),
        "vec_id", "embedding", k = 10)
    }),

    // Streaming VECTOR-INDEX maintenance — q119's IVF-PQ index kept
    // live by a stream of embedding drops (the 7th streaming twin;
    // every probe-serving family now has one): the corpus seeds the
    // stored index, two drops each encode themselves with the STORED
    // centroids/codebooks (zero training jobs) into their own batch
    // partitions (stateless ⇒ replay-idempotent), and the serve runs
    // q119's search over stored ∪ streamed codes. Same train/search
    // split as q119 ⇒ same oracle (quantizers trained on the seed,
    // search over everything).
    "q150_pq_stream_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = scratchDir("graft_pq_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      Similarity.savePqIndex(
        Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      val out = s"$base/out$run"
      val q = graft.streaming.DocumentStreams.pqIngest(s,
        landing.toString, idxDir, out, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        emb.filter(col("vec_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        graft.streaming.DocumentStreams.livePqIndex(s, idxDir, out),
        "vec_id", "embedding", k = 10)
    }),

    // Mergeable MISRA-GRIES heavy hitters (count-min q132's dual:
    // k-bounded UNDERestimates, no second data pass): token stream
    // sliced deterministically by md5(doc_id), per-slice exact counts
    // reduced to MG_20 summaries, summaries merged by counter addition
    // + one more reduce (Agarwal et al. PODS'12). Guarantees spec-
    // pinned: est ≤ truth, truth − est ≤ N/21, every token above N/21
    // present. The oracle replays every hash, rank, and subtraction.
    "q149_heavy_tokens" -> ((s, dir) =>
      graft.operators.Curation.heavyHitters(
        t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")),
        "tok", col("doc_id"), k = 20, nSlices = 8)),

    // Contamination FRACTION (q83's graded sibling): per corpus doc,
    // the share of its distinct 3-grams present in the benchmark set
    // (docs ≡ 7 mod 10 play the benchmark) — the thresholdable signal
    // real decontamination policies cut on, as an exact integer ratio.
    // Benchmark n-grams broadcast; the corpus is never shuffled by the
    // benchmark side.
    "q147_contamination_frac" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.contaminationFraction(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", n = 3)
    }),

    // Interval-containment JOIN (matched pairs, not q74's counts): every
    // error event opens a 30-min per-user incident window; emit each
    // same-user event inside a window with its offset. The tile trick
    // (operators/Intervals.scala) makes this an equi-join on
    // (user_id, tile) — the naive BETWEEN formulation would plan a
    // nested loop, which PlanSpec forbids catalog-wide.
    "q126_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("user_id"),
          col("ts_sec").as("start_sec"),
          (col("ts_sec") + 1800L).as("end_sec"))
      graft.operators.Intervals.pointInInterval(
          ev.select(col("event_id"), col("user_id"), col("ts_sec")),
          incidents, Seq("user_id"), "ts_sec", "start_sec", "end_sec",
          tileSec = 900L)
        .select(col("incident_id"), col("event_id"),
          (col("ts_sec") - col("start_sec")).as("offset_sec"))
    }),

    // Interval × interval OVERLAP join (q126's two-sided sibling — the
    // cross-doc span-merge shape): every error incident window
    // [ts, ts+30m] paired with every same-user click session window
    // [ts, ts+10m] it overlaps. Both sides tile; the responsibility-
    // tile rule (keep the pair only in greatest(start_a, start_b)'s
    // tile) makes each pair appear exactly once with NO distinct pass —
    // still a plain equi-join on (user_id, tile), which PlanSpec's
    // nested-loop guard requires.
    "q141_interval_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("event_type"))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("user_id"),
          col("ts_sec").as("inc_start"),
          (col("ts_sec") + 1800L).as("inc_end"))
      val sessions = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_sec").as("click_start"),
          (col("ts_sec") + 600L).as("click_end"))
      graft.operators.Intervals.intervalOverlap(incidents, sessions,
          Seq("user_id"), "inc_start", "inc_end", "click_start", "click_end",
          tileSec = 900L)
        .select(col("incident_id"), col("click_id"),
          (least(col("inc_end"), col("click_end")) -
            greatest(col("inc_start"), col("click_start"))).as("overlap_sec"))
    }),

    // Deterministic length-WEIGHTED sampling (token-budget subsampling:
    // inclusion probability ∝ token count, capped at 1) — q75's
    // stratified cousin with per-row weights; scan-linear, zero
    // shuffles, reproducible across engines.
    "q128_weighted_sample" -> ((s, dir) => {
      val tok = TextAnalysis.tokenCount(col("text")).cast("long")
      t(s, dir, "documents")
        .withColumn("w_micro", least(lit(1000000L), tok * 2000L))
        .filter(Curation.md5Micro("wsmp:", col("doc_id")) < col("w_micro"))
        .select(col("doc_id"), col("lang"), col("w_micro"))
    }),

    // Good-Turing bigram frequency spectrum per language — the
    // count-of-counts table an n-gram LM smoother / perplexity-based
    // quality filter starts from; discounted r* in integer micro-units.
    "q127_good_turing" -> ((s, dir) => {
      Curation.goodTuringBigrams(t(s, dir, "documents"), "lang", "text",
        maxR = 10)
    }),

    // Mergeable log-histogram quantile sketch — q98's quantiles without
    // a per-group value sort: per-lang bucket counts (O(64) state per
    // group), then the GLOBAL row is produced by MERGING the per-lang
    // sketches (bucket counts sum — the mergeability the oracle checks),
    // estimates carry the documented factor-2 ceiling bound.
    "q125_quantile_sketch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      val perLang = Curation.logHistSketch(docs, Seq("lang"), "tok")
      val merged = perLang.withColumn("lang", lit("__all__"))
        .groupBy(col("lang"), col("bucket")).agg(sum(col("n")).as("n"))
      Curation.logHistQuantiles(perLang.unionByName(merged),
        Seq("lang"), Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)))
    }),

    // Persisted SimHash index lifecycle — the FIFTH stored-index family
    // (bands q112, IVF q106, Bloom q118, PQ q119, now simhash): band a
    // seed corpus's 60-bit fingerprints pigeonhole-complete and persist
    // PARTITIONED BY band, probe drop 1 against the loaded index, APPEND
    // drop 1 (banded with the index's OWN stored hamming budget, files
    // untouched), then probe drop 2 — which near-dups against corpus AND
    // drop 1. Pigeonhole banding is recall-COMPLETE, so each probe EQUALS
    // the exact cross-side hamming filter and the oracle is q53's pair
    // SQL restricted to the cross-drop pairs.
    "q122_simhash_index_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_simhash_append", dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
      val drop1 = docs.filter(col("doc_id") % 10 === 0)
      val drop2 = docs.filter(col("doc_id") % 10 === 5)
      Dedup.saveSimHashIndex(
        Dedup.buildSimHashIndex(corpus, "doc_id", "text", maxHamming = 6), idxDir)
      Dedup.simHashProbe(Dedup.loadSimHashIndex(s, idxDir), drop1,
          "doc_id", "text")
        .write.mode("overwrite").parquet(s"$idxDir/probe1")
      Dedup.appendSimHashIndex(s, idxDir, drop1, "doc_id", "text")
      s.read.parquet(s"$idxDir/probe1").unionByName(
        Dedup.simHashProbe(Dedup.loadSimHashIndex(s, idxDir), drop2,
          "doc_id", "text"))
    }),

    // SemDeDup (Abbas et al. 2023): SEMANTIC dedup — k-means cells
    // bound the comparison scope, within-cell pairs at cosine ≥ τ form
    // domination edges, and the endpoint FARTHER from the centroid
    // survives (the paper's keep policy, made deterministic). τ = 0.35
    // sits at the synthetic embeddings' near-dup knee (the top ~0.2% of
    // pair cosines; the paper's 0.95+ presumes real encoder geometry —
    // τ is the operator's parameter either way). Integer k-means +
    // exact-integer dots ⇒ the oracle replays the trained centroids as
    // literals (SimilarityOracle.semDedupSql). The self-join is an
    // equi-join on the cell key — per-cell work stays bounded when
    // nlist grows with the corpus.
    "q153_semdedup" -> ((s, dir) =>
      Similarity.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35)),

    // Cluster-quota DIVERSITY sample: cap every k-means cell at 10 docs
    // in deterministic md5 order — shed mass from over-dense embedding
    // regions, keep coverage of sparse ones. One scan + one bounded
    // per-cell window; oracle replays centroids + the md5 order
    // (SimilarityOracle.diverseSampleSql).
    "q154_diverse_sample" -> ((s, dir) =>
      Similarity.diverseSample(t(s, dir, "embeddings"), "vec_id",
        "embedding", quota = 10)),

    // HyperLogLog distinct 3-gram shingles per source — the industry-
    // standard mergeable cardinality sketch as a 64-register relation;
    // the '__all__' row is produced BY MERGING the per-source registers
    // (per-bucket max), so the oracle hash-checks mergeability itself
    // (the q125 pattern). Raw estimator, no transcendentals beyond one
    // IEEE divide; per-source truth ~1.2-1.5k ≫ 2.5·m, the raw regime.
    "q155_hll_distinct" -> ((s, dir) => {
      val sh = t(s, dir, "documents").select(col("source"),
        explode(TextAnalysis.wordNGrams(col("text"), 3)).as("sh"))
      val perSrc = Curation.hllSketch(sh, Seq("source"), "sh")
      val merged = Curation.hllMerge(
        perSrc.withColumn("source", lit("__all__")), Seq("source"))
      Curation.hllEstimate(perSrc.unionByName(merged), Seq("source"))
    }),

    // Streaming CARDINALITY maintenance — q155's HLL kept live by a
    // stream (q130's additive-sketch idiom with a MAX-mergeable sketch):
    // the corpus seeds a register partition batch-side, two drops
    // stream in and each writes ONLY ITS OWN per-source registers to
    // its batch partition; the live registers are the per-(source,
    // bucket) MAX over committed partitions, with zero document
    // re-reads. Seed ∪ drops = the full table and max is associative/
    // commutative/idempotent, so the served estimates are IDENTICAL to
    // q155's — which is what the shared oracle checks.
    "q161_hll_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_hll_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val outPath = s"$base/out$run"
      graft.streaming.DocumentStreams.hllBatchRegisters(
          docs.filter(col("doc_id") % 20 =!= 0 && col("doc_id") % 20 =!= 10))
        .write.mode("overwrite").parquet(s"$outPath/batch_id=-1")
      val q = graft.streaming.DocumentStreams.hllIngest(s,
        landing.toString, outPath, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      val live = graft.streaming.DocumentStreams.loadHll(s, outPath)
      val merged = Curation.hllMerge(
        live.withColumn("source", lit("__all__")), Seq("source"))
      Curation.hllEstimate(live.unionByName(merged), Seq("source"))
    }),

    // DSIR importance scores (Xie et al. 2023): score every doc by the
    // log-likelihood ratio of its hashed-unigram stream under the
    // TARGET (English docs) vs RAW distribution — the data-selection
    // signal for matching a pretraining mix to a quality domain. The
    // per-bucket log weights are computed ONCE on the driver from the
    // bounded count relation (StrictMath, the trained-centroid literal
    // pattern) and broadcast; the oracle consumes the SAME literals
    // (dsirOracleSql), so no engine ever runs its own log.
    "q156_dsir_weights" -> ((s, dir) =>
      Curation.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", nBuckets = 1024)),

    // TRUE-log Okapi BM25 (q124's companion): the real logarithmic idf
    // ln(1 + (N − df + ½)/(df + ½)), computed once on the driver with
    // StrictMath over the bounded queried-token df relation and joined
    // in as micro literals — no engine runs its own ln (the DSIR/
    // centroid literal pattern). Same postings/query shape as q124;
    // multi-term rankings now damp rare terms logarithmically.
    "q157_bm25_log_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25TopKLog(docs, queries,
        "doc_id", "text", "qid", "qterms", k = 10)
    }),

    // CUBE — q171's rollup completed to all 2^k grouping combinations
    // (the missing (∅, l_linestatus) slice); same single Expand pass,
    // same grouping_id() disambiguation of real vs subtotal NULLs.
    "q186_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          grouping_id().cast("int").as("gid"))
    }),

    // GROUPING SETS — the general form rollup/cube are sugar for: an
    // explicit set list that is NEITHER (two disjoint single-column
    // sets, no combined or grand-total slice). Still one Expand pass —
    // rows replicate once per set, not once per pass over the table.
    "q187_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("sum_cents"),
          grouping_id().cast("int").as("gid"))
    }),

    // UNPIVOT — wide-to-long reshape (q172's inverse): the three metric
    // columns of a keyed aggregate melt into (key, metric, value) rows.
    // Native Dataset.unpivot (an Expand under the hood — one pass, no
    // union-of-selects re-scan).
    "q188_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"))
      wide.unpivot(Array(col("l_returnflag")),
        Array(col("n_rows"), col("sum_qty"), col("sum_price_cents")),
        "metric", "value")
    }),

    // Per-user time-series windows: inter-event gaps (lag/lead in exact
    // epoch micros) and a 3-row rolling spend — one shuffle keyed on
    // user, row-bounded frames (O(frame) state per key, no self-join).
    // Restricted to a deterministic user slice to keep the result
    // relation-sized; the windows run over each kept user's FULL stream
    // either way (user_id is the partition key, so filtering commutes).
    "q189_event_deltas" -> ((s, dir) => {
      graft.operators.TimeSeries.eventDeltas(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value")
        .filter(col("user_id") % 50 === 7)
        .select(col("user_id"), col("event_id"), col("seq"),
          col("gap_us"), col("next_gap_us"), col("mov3_cents"))
    }),

    // PAGERANK over the customer↔supplier trade graph (bidirectional
    // edges from order lines), 6 power iterations of FLOOR-DIVISION
    // fixed-point arithmetic — engine- and partitioning-exact, no IEEE
    // op anywhere (operators/Graph.scala). Node ids disambiguate the
    // two key spaces (cust → 2k, supp → 2k+1). Top 20 by (rank desc,
    // node asc) — a total order, so the limit is deterministic.
    "q190_pagerank" -> ((s, dir) => {
      val fwd = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.union(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 6)
        .orderBy(col("rank").desc, col("node").asc)
        .limit(20)
    }),

    // RIDGE REGRESSION fit + worst-fit report: exact-integer normal-
    // equation moments in one pass, driver solve, micro-literal weights
    // (operators/Regression.scala — the PCA discipline applied to
    // supervised fitting), then the 50 order lines the price model
    // misses worst — regression-as-anomaly-detection. The oracle
    // rescores with the SAME literals (the fit is deterministic, so the
    // generator's refit reproduces them bit-for-bit).
    "q191_ridge_residuals" -> ((s, dir) => {
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("p_retailprice")).as("price_cents"),
          cents(col("l_extendedprice")).as("y_cents"))
      val fit = graft.operators.Regression.fitRidge(joined, "y_cents",
        Seq("qty", "price_cents"), lambda = 1e6)
      graft.operators.Regression.scoreResiduals(joined, "y_cents", fit)
        .orderBy(abs(col("resid_micro")).desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(50)
        .select(col("l_orderkey"), col("l_linenumber"), col("y_cents"),
          col("pred_micro"), col("resid_micro"))
    }),

    // Hashed NAIVE BAYES language id (operators/Classify.scala): train
    // on 90% of docs (counts → driver StrictMath log-likelihood micro
    // literals, the bm25LogIdf pattern), classify the held-out 10% by
    // exact-integer argmax. The oracle replays the IDENTICAL literal
    // table — no engine runs its own ln.
    "q192_nb_language" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Classify.fitHashedNb(
        docs.filter(col("doc_id") % 10 =!= 0), "text", "lang",
        nBuckets = 64)
      graft.operators.Classify.scoreHashedNb(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", model)
    }),

    // CHANGE FEED on the committed postings store: save (gen 0) + two
    // committed appends, then read the (0, 2] incremental window — the
    // docs each generation added, from ONLY that window's manifested
    // files (the Delta table_changes idea on the manifest log). The
    // consumer-side half of the commit-log story: q163/q164 proved
    // writers and snapshot readers; this is how a downstream index
    // replica catches up without rescanning the store.
    "q193_postings_changes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_cdc", dir)
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 20 === 10), "doc_id", "text")
      graft.operators.Retrieval.postingsAdditions(s, idxDir,
        fromGen = 0L, toGen = 2L)
    }),

    // PARETO FRONTIER (2-D skyline, both maximized) of parts by
    // (size, price): the multi-objective filter a curation pipeline
    // runs ("biggest AND most valuable candidates"). Sort-based — one
    // keyed agg + a window over the DISTINCT-x relation — while the
    // oracle is the O(n²) NOT-EXISTS dominance definition, so the
    // check is genuinely independent of the algorithm.
    "q194_pareto_parts" -> ((s, dir) => {
      graft.operators.Relational.paretoFrontier2(
        t(s, dir, "part").select(col("p_partkey"),
          col("p_size").cast("long").as("size_l"),
          cents(col("p_retailprice")).as("price_cents")),
        "size_l", "price_cents")
        .select(col("p_partkey"), col("size_l"), col("price_cents"))
    }),

    // HITS hubs & authorities over the DIRECTED customer→supplier
    // trade graph — the bipartite reading where buyers are pure hubs
    // and suppliers pure authorities (Kleinberg's shape). 4 fixed-point
    // iterations, max-normalized by integer division; the per-round max
    // is one scalar collect (the bounded-literal pattern), and the
    // oracle recomputes it as a scalar subquery — identical integers.
    "q197_hits" -> ((s, dir) => {
      val fwd = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.operators.Graph.hits(fwd, "src", "dst", iters = 4)
        .orderBy(col("auth").desc, col("hub").desc, col("node").asc)
        .limit(20)
    }),

    // Multi-source BFS: exact hop distance from a seed set of customers
    // through the bidirectional trade graph, 4 relaxation rounds. The
    // per-round state holds only REACHED nodes; each round is one
    // edge-keyed join + a min-aggregation (the frontier never collects
    // to the driver).
    "q198_bfs_hops" -> ((s, dir) => {
      val fwd = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.union(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "customer")
        .filter(col("c_custkey") % 500 === 1)
        .select((col("c_custkey") * 2).as("node"))
      graft.operators.Graph.bfsHops(edges, "src", "dst", seeds, "node",
        maxHops = 4)
    }),

    // Per-node TRIANGLE counts over the co-supplier graph (suppliers
    // sharing ≥ 5 orders): ordered (a < b < c) enumeration — each
    // triangle found once through two joins on the canonical edge list,
    // the node-ordering trick that bounds the wedge explosion — then
    // credited to all three corners. The oracle replays the same triple
    // join declaratively.
    "q199_triangles" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
        .distinct()
      val e = pairs.as("x").join(pairs.as("y"),
          col("x.ok") === col("y.ok") && col("x.s") < col("y.s"))
        .groupBy(col("x.s").as("a"), col("y.s").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 5)
        .select(col("a"), col("b"))
      graft.operators.Graph.triangleCounts(e, "a", "b")
    }),

    // COHORT-RETENTION matrix: users bucketed by first-active week
    // (integer epoch-micros div 7 days — no calendar function, engine-
    // identical bins), each cohort's distinct active users per week of
    // age. Two partial-aggregated keyed aggs, no window, no self-join.
    "q200_cohort_retention" -> ((s, dir) => {
      graft.operators.TimeSeries.cohortRetention(
        t(s, dir, "events"), "user_id", "ts")
    }),

    // STREAMING drift-monitor twin (q185's maintenance path): the
    // per-(source, bucket) token histograms accumulate one micro-batch
    // partition at a time (sum-mergeable exact counts, the q130/q161
    // idiom), and the TVD report over the merged live histogram equals
    // the batch report over the full corpus — same oracle as q185.
    // Backfill partition = 90% of docs batch-side; the remaining 10%
    // arrive as two streamed drops through a real AvailableNow query.
    "q196_drift_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_drift_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val outPath = s"$base/out$run"
      Curation.driftBucketCounts(
          docs.filter(col("doc_id") % 10 =!= 0), "text", "source")
        .write.mode("overwrite").parquet(s"$outPath/batch_id=-1")
      val q = graft.streaming.DocumentStreams.driftIngest(s,
        landing.toString, outPath, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      Curation.driftTvdFromCounts(
        graft.streaming.DocumentStreams.loadDriftCounts(s, outPath),
        "source", nBuckets = 64)
    }),

    // EXACT interpolated quantiles (percentile_cont) in pure integer
    // micro units — q195's median machinery generalized to an
    // arbitrary quantile list; position split exactly into
    // (lo, frac-bp) so the interpolation never runs an IEEE multiply.
    "q201_exact_quantiles" -> ((s, dir) => {
      Curation.exactQuantiles(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("v")),
        Seq("l_returnflag"), "v",
        Seq(("p25", 2500), ("p50", 5000), ("p90", 9000)))
    }),

    // L0→base ABSORB on the drift store (the q152 promotion applied to
    // the stats-store family): stream a drop, absorb every batch
    // partition into one merged base, then stream ANOTHER drop through
    // a fresh landing/checkpoint — the served TVD report is the full-
    // corpus q185 report throughout (counts sum exactly), which is what
    // the shared oracle checks.
    "q202_drift_absorb" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_drift_absorb", dir)
      val run = streamRuns.incrementAndGet()
      val outPath = s"$base/out$run"
      Curation.driftBucketCounts(
          docs.filter(col("doc_id") % 10 =!= 0), "text", "source")
        .write.mode("overwrite").parquet(s"$outPath/batch_id=-1")
      def streamDrop(phase: Int, m: Int): Unit = {
        val landing = new java.io.File(s"$base/landing$run-$phase")
        landing.mkdirs()
        val q = graft.streaming.DocumentStreams.driftIngest(s,
          landing.toString, outPath, s"$base/ckpt$run-$phase",
          maxFilesPerTrigger = Some(1))
        val stage = s"$base/stage$run-$phase"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop.parquet"))
        q.processAllAvailable()
        q.stop()
      }
      streamDrop(0, 0)
      graft.streaming.DocumentStreams.absorbDriftPartitions(s, outPath,
        s"$base/ckpt$run-0")
      streamDrop(1, 10)
      Curation.driftTvdFromCounts(
        graft.streaming.DocumentStreams.loadDriftCounts(s, outPath),
        "source", nBuckets = 64)
    }),

    // Integer rank-percentile FEATURES (percent_rank + decile binning
    // in exact arithmetic): the rank-normalization a feature pipeline
    // applies before training, with a total-order tiebreak so both
    // engines assign identical ranks. Windows run over each event
    // type's FULL stream; the event_id slice only bounds the output.
    "q203_rank_features" -> ((s, dir) => {
      Curation.rankFeatures(
          t(s, dir, "events")
            .select(col("event_id"), col("event_type"),
              cents(col("value")).as("value_cents")),
          Seq("event_type"), "value_cents", Seq("event_id"))
        .filter(col("event_id") % 37 === 0)
        .select(col("event_id"), col("event_type"), col("value_cents"),
          col("rn"), col("n_rows"), col("pct_micro"), col("decile"))
    }),

    // TYPE-2 SCD history: each user's event_type stream collapsed to
    // versioned validity intervals (a new version only on CHANGE) —
    // the Kimball dimension-history build as one keyed window pass.
    "q204_scd2_history" -> ((s, dir) => {
      graft.operators.Cdc.scd2History(
          t(s, dir, "events")
            .filter(col("user_id") % 7 === 0)
            .select(col("user_id"), col("ts"), col("event_id"),
              col("event_type")),
          Seq("user_id"), "ts", "event_id", Seq("event_type"))
        .select(col("user_id"), col("event_type"), col("valid_from_us"),
          col("valid_to_us"), col("version"), col("is_current"))
    }),

    // CDC latest-wins APPLY, replayed in two stages: a base snapshot
    // built from the pre-cutoff log slice, then the post-cutoff slice
    // applied onto it — the oracle computes the end state in ONE pass
    // over the whole log, so the row genuinely checks that staged
    // replay ≡ recompute (the slice boundary respects timestamp order,
    // the composition contract). error events act as deletes.
    "q205_cdc_apply" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type"), cents(col("value")).as("value_cents"))
      val cut = lit("2024-01-08").cast("timestamp")
      val payload = Seq("event_type", "value_cents")
      val empty = ev.select(("user_id" +: payload).map(col): _*).limit(0)
      val base = graft.operators.Cdc.cdcApply(empty,
        ev.filter(col("ts") < cut), Seq("user_id"), "ts", "event_id",
        "op", payload)
      graft.operators.Cdc.cdcApply(base, ev.filter(col("ts") >= cut),
        Seq("user_id"), "ts", "event_id", "op", payload)
    }),

    // Word2vec phrase detection: top-50 collocations by the discounted
    // integer lift score — the pre-tokenization pass that merges
    // "new york"-style pairs before training.
    "q206_collocations" -> ((s, dir) => {
      Curation.collocations(t(s, dir, "documents"), "text",
        minCount = 5, topK = 50)
    }),

    // EXACT grouped median without floats: median2x = the sum of the
    // two middle order statistics (2× the middle for odd counts) of
    // per-flag quantities — integer-exact, so no half-point rounding
    // convention can diverge between engines. One shuffle: both the
    // rank and the partition count come from the same window partition.
    "q195_grouped_median" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      val wp = Window.partitionBy(col("l_returnflag"))
      val ranked = li
        .withColumn("rn", row_number().over(wp.orderBy(col("qty").asc)))
        .withColumn("cnt", count(lit(1)).over(wp))
      ranked.groupBy(col("l_returnflag"), col("cnt"))
        .agg((sum(when(col("rn") === expr("(cnt + 1) div 2"), col("qty"))
            .otherwise(0L)) +
          sum(when(col("rn") === expr("cnt div 2 + 1"), col("qty"))
            .otherwise(0L))).as("median2x"))
        .select(col("l_returnflag"), col("cnt").as("n_rows"),
          col("median2x"))
    }),

    // BPE VOCABULARY TRAINING (Sennrich 2016) under the oracle: k
    // count-merge-recount rounds learn the merge table in Spark
    // (Bpe.train — one corpus-sized pass builds the word-frequency
    // vocab, every round after is vocab-sized), then the vocabulary is
    // segmented under the learned table. The DuckDB mirror retrains
    // NOTHING at query time: bpeOracleSql re-derives the merges
    // deterministically (exact integer counts, total-order argmax
    // tiebreak) and replays them as k nested boundary-aligned
    // replace() literals — so the hash check proves the learned
    // SEGMENTATION (exact subword boundaries, not just counts)
    // transfers engines. seg_disp maps the u0001/u0002 wrappers to
    // []: the control chars stay out of the output hash.
    "q207_bpe_train" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", nMerges = 20)
      graft.operators.Bpe.segmentVocab(docs, "text", merges)
        .select(col("word"), col("freq"),
          translate(col("seg"), "\u0001\u0002", "[]").as("seg_disp"),
          col("n_subwords"))
    }),

    // Snapshot-manifest commits on the BAND family (the r9 verdict's
    // missing-#1, now shared StoreFiles machinery): committed save +
    // one OCC-guarded committed append, then a TORN append (crashed
    // writer — band/set files land, no manifest row ever does). The
    // snapshot probe serves exactly the committed corpus, so the
    // result equals q101's full-index probe — and a torn batch leaking
    // into the snapshot would pair probe docs with each other, rows
    // the oracle's cross-pair predicate excludes.
    "q208_band_snapshot_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_band_snapshot", dir)
      Dedup.saveBandIndexCommitted(
        Dedup.buildBandIndex(
          docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5),
          "doc_id", "text"), idxDir)
      Dedup.appendBandIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 10 === 5), "doc_id", "text",
        expectedGen = Some(Dedup.bandGen(s, idxDir)))
      // the torn writer: data files land, the manifest row never does
      Dedup.appendBandIndex(s, idxDir,
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
      Dedup.minHashLshProbe(Dedup.loadBandIndexSnapshot(s, idxDir),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
    }),

    // TIME TRAVEL on the positional index (parity with its postings
    // sibling q164): committed save (gen 0) + OCC-guarded committed
    // append of the rest of the corpus (gen 1), then the phrase set
    // served AS OF generation 0 — matches must come from the seed
    // corpus alone, which is exactly what the restricted oracle
    // computes. Bucket pruning survives the snapshot read (basePath).
    "q209_phrase_time_travel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_positional_tt", dir)
      graft.operators.Retrieval.savePositionalIndexCommitted(
        graft.operators.Retrieval.buildPositionalIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val g0 = graft.operators.Retrieval.positionalGen(s, idxDir)
      graft.operators.Retrieval.appendPositionalIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        expectedGen = Some(g0))
      val phrases = docs
        .filter(col("doc_id") % 2000 === 11 &&
          size(split(col("text"), " ")) >= 5)
        .select(col("doc_id").as("pid"),
          slice(split(col("text"), " "), 3, 3).as("pterms"))
      graft.operators.Retrieval.phraseSearchIndex(phrases,
        graft.operators.Retrieval.loadPositionalIndexSnapshot(s, idxDir,
          asOf = Some(0L)),
        "pid", "pterms")
    }),

    // ExactSubstr-style duplicated-substring SPANS (Lee et al. 2021):
    // q90's dupNgramStats reports the per-doc duplicated FRACTION and
    // q135's stripDupSpans cuts cross-doc boilerplate wholesale; this
    // materializes WHERE the duplication sits — maximal merged token
    // spans whose 5-grams occur ≥ 2 times corpus-wide (self-repeats
    // included, unlike q135's df rule). One gram-count shuffle, one
    // 1:1 fingerprint join back, one per-doc island-merge window.
    "q210_dup_spans" -> ((s, dir) =>
      Curation.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5)),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003 —
    // MOSS): per-window minimum k-gram hash, rightmost on ties, via a
    // single struct-min window pass. The LOCAL fingerprint sketch that
    // guarantees any shared run of ≥ w + k − 1 tokens is caught by a
    // common selected fingerprint — position-robust where q60's
    // whole-doc hash is all-or-nothing.
    "q211_winnow_fingerprints" -> ((s, dir) =>
      Curation.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 4)),

    // The ExactSubstr dedup APPLY step under the paper's KEEP-ONE-COPY
    // policy (q135 removes ALL copies of cross-doc boilerplate; here
    // exactly one occurrence survives and intra-doc repeats count):
    // every duplicated 5-gram occurrence trims except the corpus-wide
    // (doc_id, pos)-least canonical copy, and per-doc trimmed/kept
    // token counts come out. One gram aggregate carries both the count
    // and the struct-min owner (associative, map-side combined), so
    // dedup policy adds no extra shuffle over q210.
    "q212_span_trim" -> ((s, dir) =>
      Curation.trimDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5)),

    // Fertility of the LEARNED tokenizer by language — q96 divides by
    // a rule-of-thumb estimate; this segments the corpus under the
    // q207-trained merge table (segmentation work stays
    // vocabulary-sized, the corpus only tokenizes and joins) and rolls
    // subword counts up per language as an exact integer-micro ratio.
    // The per-language fertility gap is the standard signal that a
    // vocabulary under-serves a language.
    "q213_bpe_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", nMerges = 20)
      graft.operators.Bpe.segmentCorpus(docs, "doc_id", "text", merges)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
          sum(col("n_subwords")).as("n_subwords"))
        .withColumn("fertility_micro",
          expr("n_subwords * 1000000 div n_words"))
    }),

    // The WINNOW fingerprint index — tenth persisted store family,
    // manifest-committed from day one: committed save + OCC-guarded
    // committed append + a TORN append the snapshot probe never sees
    // (q208's lifecycle on the q211 sketch). The probe pairs the batch
    // against the STORED fingerprints (corpus text never re-read),
    // df-capping boilerplate fingerprints before pairing — the
    // partial-overlap candidate generator whole-doc fingerprints and
    // minhash-over-whole-docs both miss.
    "q214_winnow_index_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_winnow_index", dir)
      Dedup.saveWinnowIndexCommitted(
        Dedup.buildWinnowIndex(
          docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5),
          "doc_id", "text"), idxDir)
      Dedup.appendWinnowIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") % 10 === 5), "doc_id", "text",
        expectedGen = Some(Dedup.winnowGen(s, idxDir)))
      // the torn writer: fp files land, the manifest row never does
      Dedup.appendWinnowIndex(s, idxDir,
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
      Dedup.winnowProbe(Dedup.loadWinnowIndexSnapshot(s, idxDir),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        minShared = 2L, maxDf = 50L)
    }),

    // STREAMING twin of the winnow gate — partial-overlap admission
    // over a landing dir of drops: drop 2's probe sees the corpus AND
    // drop 1's admitted rows (re-fingerprinted from committed
    // partitions; the store itself is immutable), so the df-cap and
    // the gate recompute exactly as the one-pass oracle replays them.
    // Thirteenth streaming maintenance twin, first on the winnow
    // family.
    "q215_winnow_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_winnow_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/winnow$run"
      Dedup.saveWinnowIndex(
        Dedup.buildWinnowIndex(corpus, "doc_id", "text"), idxDir)
      val q = graft.streaming.DocumentStreams.winnowIngest(s,
        landing.toString, idxDir, s"$base/out$run", s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      s.read.schema(graft.streaming.DocumentStreams.documentsFileSchema)
        .parquet(s"$base/out$run")
        .select(col("doc_id"))
    }),

    // DELETE lifecycle on the winnow family (q160's shape): tombstone
    // % 7 = 3 corpus docs TWICE (idempotence under the oracle — the
    // second call appends nothing), then probe. A forgotten doc's
    // fingerprints can no longer pair, so its near-duplicates re-admit
    // — and the df-cap recomputes over SURVIVORS, exactly what the
    // restricted mirror counts.
    "q216_winnow_delete_probe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_winnow_delete", dir)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.saveWinnowIndex(
        Dedup.buildWinnowIndex(corpus, "doc_id", "text"), idxDir)
      val dead = corpus.filter(col("doc_id") % 7 === 3).select("doc_id")
      Dedup.deleteFromWinnowIndex(s, idxDir, dead, "doc_id")
      Dedup.deleteFromWinnowIndex(s, idxDir, dead, "doc_id") // idempotent
      Dedup.winnowProbe(Dedup.loadWinnowIndex(s, idxDir),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        minShared = 2L, maxDf = 50L)
    }),

    // k-CORE PEEL over the co-supplier support graph (the q199 edge
    // relation): 4 rounds of "drop nodes with degree < 3", the classic
    // link-farm / dense-cluster gate (Matula-Beck). Result is a pure
    // function of (edges, k, rounds); the oracle unrolls the identical
    // rounds (the q190 fixed-iteration discipline). GraphSpec proves a
    // 5th round changes nothing on this graph shape.
    "q217_kcore" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
        .distinct()
      val e = pairs.as("x").join(pairs.as("y"),
          col("x.ok") === col("y.ok") && col("x.s") < col("y.s"))
        .groupBy(col("x.s").as("a"), col("y.s").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 5)
        .select(col("a"), col("b"))
      graft.operators.Graph.kCore(e, "a", "b", k = 3, rounds = 4)
    }),

    // GRADED-RELEVANCE RETRIEVAL EVAL (nDCG@10, MRR@10) in exact
    // integer micro units: pool = BM25 top-20, run = its top-10, qrels
    // = md5-graded pseudo-judgments over the pool (the TREC pooling
    // shape). Discounts floor(1e6/log2(r+1)) are driver-generated
    // literals BOTH engines join — no engine runs its own log.
    "q218_ndcg_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      val pool = graft.operators.Retrieval.bm25TopK(docs, queries,
        "doc_id", "text", "qid", "qterms", k = 20).localCheckpoint()
      val qrels = pool.select(col("qid"), col("doc_id"),
        (conv(substring(md5(concat(lit("qr:"), col("qid").cast("string"),
          lit(":"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 4L).as("rel"))
      graft.operators.Retrieval.ndcgMrrEval(
        pool.filter(col("rn") <= 10), qrels, k = 10)
    }),

    // Streaming maintenance twin for the count-min sketch: seed cells
    // + 2 real AvailableNow drops, each batch appending its OWN cell
    // partition; the served estimate reads the per-(r,c) SUM — cells
    // merge by addition, so the result is exactly q132's full-corpus
    // estimate (same oracle).
    "q220_cm_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_cm_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val outPath = s"$base/out$run"
      Curation.cmSketch(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select(explode(split(col("text"), " ")).as("token")), "token")
        .cells.write.mode("overwrite").parquet(s"$outPath/batch_id=-1")
      val q = graft.streaming.DocumentStreams.cmIngest(s,
        landing.toString, outPath, s"$base/ckpt$run",
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      val probe = docs.filter(col("doc_id") % 250 === 3)
        .select(explode(split(col("text"), " ")).as("token")).distinct()
      Curation.cmEstimate(
        Curation.CmSketch(
          graft.streaming.DocumentStreams.loadCmCells(s, outPath),
          depth = 4, width = 1024),
        probe, "token")
        .select(col("k").as("token"), col("est").as("est_count"))
    }),

    // Interpolated KNESER-NEY bigram model (d = 3/4 exact via
    // multiply-by-4, continuation counts, micro fixed-point with two
    // documented floor divisions) — the smoothing family behind
    // KenLM-style quality-filter LMs. Completes the LM suite: q127
    // Good-Turing spectrum, q128 surprisal scoring, now proper
    // smoothed probabilities with backoff mass.
    "q219_kneser_ney" -> ((s, dir) =>
      Curation.kneserNeyBigrams(t(s, dir, "documents"), "text",
        minCount = 3, topK = 300)),

    // SymSpell spelling correction (symmetric delete neighborhoods,
    // Garbe 2012): deterministic OCR-style corruptions (each ≥5-char
    // vocabulary term with its 2nd character deleted) corrected back
    // against the ≥5-count vocabulary via ONE equi-join on delete-1
    // keys — scan-linear, never all-pairs — verified by levenshtein
    // (integer DP, engine-identical), ranked most-frequent-first.
    "q221_spell_correct" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // dict and queries both read it — one pass
      val dict = counts.filter(col("c") >= 5)
        .select(col("w").as("term"), col("c").as("freq"))
      val queries = counts.filter(col("c") >= 5 && length(col("w")) >= 5)
        .select(concat(col("w").substr(lit(1), lit(1)),
          col("w").substr(lit(3), lit(1000000))).as("q"))
      graft.operators.Spell.corrections(dict, "term", "freq",
        queries, "q", topK = 3, minLen = 4)
    }),

    // ROC AUC (Mann-Whitney with ties, exact integer micros) of an
    // English-stopword-count classifier against the lang label, per
    // source — the threshold-free eval a quality/language filter gets
    // before its cut is trusted. Two chained milli scalings keep every
    // intermediate inside BIGINT; NULL where a source lacks a class.
    "q222_roc_auc" -> ((s, dir) => {
      val sw = Seq("the", "of", "and", "to", "in", "a", "is", "that")
      graft.operators.Classify.rocAuc(
        t(s, dir, "documents").select(col("source"),
          size(filter(split(col("text"), " "), t => t.isin(sw: _*)))
            .cast("long").as("score"),
          (col("lang") === "en").cast("int").as("label")),
        Seq("source"), "score", "label")
    }),

    // IVF-SQ8 ANN — the faiss middle ground the family was missing
    // between raw IVF (q57, full vectors in-index) and IVF-PQ (q116,
    // subspace codes): ONE linear byte code per dimension, exact
    // integer L2 on the 255-scaled reconstruction, coarse-cell routing
    // identical to q116. Generated mirror replays the trained bounds.
    "q223_ann_ivf_sq8_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfSq8TopK(emb.filter(col("vec_id") % 25 === 0), emb,
        "vec_id", "embedding", k = 10)
    }),

    // PRECISION/RECALL/F1 sweep over every observed threshold of the
    // q222 stopword classifier — the operating-point picker (which cut
    // do we actually filter at?) sharing q222's per-(source, score)
    // count relation shape. Exact integer micros, divisions floored in
    // the documented order.
    "q224_pr_curve" -> ((s, dir) => {
      val sw = Seq("the", "of", "and", "to", "in", "a", "is", "that")
      graft.operators.Classify.prCurve(
        t(s, dir, "documents").select(col("source"),
          size(filter(split(col("text"), " "), t => t.isin(sw: _*)))
            .cast("long").as("score"),
          (col("lang") === "en").cast("int").as("label")),
        Seq("source"), "score", "label")
    }),

    // T5-style SPAN CORRUPTION (Raffel et al. 2020): each document
    // becomes a denoising training pair — input with md5-deterministic
    // masked spans replaced by numbered sentinels, target spelling out
    // the hidden tokens. Adjacent/overlapping masks merge (island
    // windows); one ordered window pass + one reassembly agg per doc.
    "q225_span_corruption" -> ((s, dir) =>
      Curation.spanCorruption(t(s, dir, "documents"), "doc_id", "text",
        startPct = 10, spanLen = 3)),

    // RENDEZVOUS (highest-random-weight) shard map, 8 → 9 shards: the
    // consistent-placement scheme that grows a 100 TB table's shard
    // count moving only ~1/9 of keys (mod-N would reshuffle 8/9). Per
    // old shard: how many docs, how many moved — every move lands on
    // the NEW shard by the argmax property (RendezvousSpec asserts it).
    "q226_rendezvous_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val s8 = graft.operators.Layout.rendezvousShards(docs, "doc_id", 8)
      val s9 = graft.operators.Layout.rendezvousShards(docs, "doc_id", 9)
        .withColumnRenamed("shard", "shard9")
      s8.join(s9, Seq("doc_id"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("shard9") =!= col("shard")).cast("long")).as("n_moved"))
    }),

    // CONFUSION MATRIX of the q192 NB language classifier on its held-
    // out split — which languages leak into which predictions. Joins
    // the argmax predictions back to true labels; one keyed count.
    // Completes the eval family: AUC (q222), PR sweep (q224), now the
    // per-class error structure.
    "q227_confusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Classify.fitHashedNb(
        docs.filter(col("doc_id") % 10 =!= 0), "text", "lang",
        nBuckets = 64)
      graft.operators.Classify.scoreHashedNb(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", model)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
    }),

    // SIZE-TIERED (L0) compaction — the LSM move the full per-family
    // compactions don't make. Seed commits gen 0 (the base, 90% of the
    // corpus); FOUR small committed appends stack up as L0 runs (gens
    // 1-4). Below the trigger the policy refuses (minRuns=5 → false:
    // one hot batch never causes a rewrite); at minRuns=3 it merges
    // ONLY the four appended runs into one fresh run per sub (postings
    // re-bucketed, stats deltas summed) and re-bases the manifest —
    // the generation-0 base files are NEVER rewritten, so at 100 TB
    // the rewrite cost scales with the ingest, not the corpus. The
    // serve afterwards scores the full corpus exactly as if compaction
    // never ran — which is what the oracle computes.
    "q228_postings_l0_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_l0", dir)
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      for (r <- 0 to 3)
        graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
          docs.filter(col("doc_id") % 40 === r * 10L), "doc_id", "text")
      require(!graft.operators.Retrieval.compactPostingsL0(s, idxDir,
        minRuns = 5), "q228: 4 runs must not trigger a minRuns=5 compact")
      require(graft.operators.Retrieval.compactPostingsL0(s, idxDir,
        minRuns = 3), "q228: 4 runs must trigger a minRuns=3 compact")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // RELIABILITY DIAGRAM / calibration bins (Guo et al. ICML'17) —
    // completes the eval family around threshold-free AUC (q222), the
    // operating-point sweep (q224), and per-class errors (q227): does
    // the score's VALUE mean anything? The stopword-ratio en-detector
    // claims confidence = ratio in micros; per (source, decile bin)
    // the mean claimed confidence vs the observed en-rate and their
    // gap (the bin's ECE contribution) — one keyed aggregation,
    // ≤ groups × 10 output rows at any corpus size.
    "q229_calibration_bins" -> ((s, dir) => {
      val sw = Seq("the", "of", "and", "to", "in", "a", "is", "that")
      graft.operators.Classify.calibrationBins(
        t(s, dir, "documents").select(col("source"),
            size(filter(split(col("text"), " "), w => w.isin(sw: _*)))
              .cast("long").as("nsw"),
            size(split(col("text"), " ")).cast("long").as("nt"),
            (col("lang") === "en").cast("long").as("label"))
          .select(col("source"), expr("(nsw * 1000000L) div nt").as("score"),
            col("label")),
        Seq("source"), "score", "label", nBins = 10)
    }),

    // DIRECTIONAL containment dedup — the subset-duplication signal
    // (a quote/excerpt pasted into a larger doc) that symmetric
    // Jaccard (q52) misses whenever |B| >> |A|: C(a->b) = |A∩B|/|A|
    // in exact integer micros, PPJoin prefix shortened on the PROBE
    // side only (the index side must keep full postings — no size
    // bound on B is the point), hot shingles through the ordered-pair
    // tile grid. The oracle recomputes every co-shingled ordered pair.
    "q230_containment_dedup" -> ((s, dir) =>
      graft.operators.Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", n = 3, thresholdMicro = 800000L)),

    // BATCHED BPE training (the SentencePiece speedup): one pair count
    // feeds up to 5 conflict-free merges per round, so the 20-merge
    // table trains in ~4 vocab recounts instead of 20 — the move that
    // makes a 32k-merge vocabulary trainable. A DIFFERENT published
    // variant, not a fast path to q207's table (classic BPE recounts
    // after every merge); the mirror re-learns the SAME batched table
    // deterministically and replays it as nested replaces, so the
    // hash check proves the batched segmentation transfers engines.
    "q231_bpe_train_batched" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.trainBatched(docs, "text",
        nMerges = 20, batchSize = 5)
      graft.operators.Bpe.segmentVocab(docs, "text", merges)
        .select(col("word"), col("freq"),
          translate(col("seg"), "\u0001\u0002", "[]").as("seg_disp"),
          col("n_subwords"))
    }),

    // TREC-convention retrieval eval (q218's full-outer sibling): the
    // run SKIPS every qid % 3 == 0 query, so a mean nDCG over q218's
    // run-seeded output would silently inflate; this variant seeds
    // from qrels ∪ run and scores the skipped-but-judged queries 0
    // (dcg/mrr/ndcg) with their real n_rel/idcg — averages over the
    // relation are trustworthy. Same discount literals both engines.
    "q232_ndcg_eval_full" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      val pool = graft.operators.Retrieval.bm25TopK(docs, queries,
        "doc_id", "text", "qid", "qterms", k = 20).localCheckpoint()
      val qrels = pool.select(col("qid"), col("doc_id"),
        (conv(substring(md5(concat(lit("qr:"), col("qid").cast("string"),
          lit(":"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 4L).as("rel"))
      graft.operators.Retrieval.ndcgMrrEvalFull(
        pool.filter(col("rn") <= 10 && col("qid") % 3 =!= 0), qrels,
        k = 10)
    }),

    // AUTO-TRIGGERED compaction (q228 gave the mechanism; this row is
    // the POLICY): an ingest loop calls maintainPostingsL0 after every
    // committed append, and the store self-regulates — with maxRuns=3
    // the L0 stack grows 1, 2 (no trigger), hits 3 → compacts and
    // re-bases, then grows 1, 2 again from the fresh base. The require
    // chain pins the exact fire pattern AND that the re-based manifest
    // restarts its generation count, so a 1000-append nightly loop
    // holds read amplification at ≤ maxRuns extra file groups forever
    // with rewrite cost proportional to ingest. Serve afterwards is
    // the full corpus, byte-identical to never having compacted —
    // which is what the oracle computes.
    "q233_auto_compact_policy" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_autoc", dir)
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 3)
      val fired = (0 to 4).map { r =>
        graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
          docs.filter(col("doc_id") % 50 === r * 10L), "doc_id", "text")
        graft.operators.Retrieval.maintainPostingsL0(s, idxDir, policy)
      }
      require(fired == Seq(false, false, true, false, false),
        s"q233: expected the policy to fire exactly on the 3rd append, got $fired")
      require(graft.operators.Retrieval.postingsGen(s, idxDir) == 2L,
        "q233: post-compaction appends must restart from the re-based gen 0")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // BPE AT VOCABULARY SCALE — the real-tokenizer shape (k in the
    // thousands), exercised on the one table whose character structure
    // sustains it: customer names are ID-like strings, so merges walk
    // the digit-prefix tree far past the 107-pair ceiling of the
    // documents word vocabulary. minCount=1 is the standard trainer
    // contract (no floor — train to the vocab-size target); the
    // conflict filter thins hard here because every early pair shares
    // a digit symbol, which is exactly what the deeper overfetch is
    // for. The require pins turn the at-scale claim into a measured
    // fact: ~1000 merges in ≤72 recounts (≥5 merges accepted per
    // recount) — classic training would pay ~1000. The oracle replays
    // the learned table over the vocab in chunked 50-replace CTE
    // layers (DuckDB's expression-depth bound; same left-to-right
    // non-overlapping replace semantics).
    "q234_bpe_vocab_scale" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val (merges, rounds) = graft.operators.Bpe.trainBatchedCounted(
        cust, "c_name", nMerges = 1000, batchSize = 64, minCount = 1,
        overfetch = 16)
      require(rounds <= 72,
        s"q234: batching must compress recounts (<= 72), got $rounds")
      require(merges.size >= 5 * rounds,
        s"q234: expected >= 5 merges/recount, got ${merges.size} in $rounds")
      graft.operators.Bpe.segmentVocab(cust, "c_name", merges)
        .select(col("word"), col("freq"),
          translate(col("seg"), "\u0001\u0002", "[]").as("seg_disp"),
          col("n_subwords"))
    }),

    // SEQUENCE PACKING (GPT concat-and-chunk): the corpus as one
    // deterministic token stream cut into 512-token training chunks,
    // documents crossing boundaries — the padding-free pretraining
    // layout. The output is the packing PLAN (one row per
    // chunk×document span, |documents| rows — tokens never
    // materialize); offsets come from the two-phase distributed
    // exclusive scan (per-partition sums collected once, no
    // single-partition window). The oracle recomputes the same spans
    // from a window cumsum — exact integers, so the hash pins every
    // boundary split.
    "q235_sequence_packing" -> ((s, dir) =>
      graft.operators.Layout.packSequences(
        t(s, dir, "documents").withColumn("n_tokens",
          TextAnalysis.tokenCount(col("text")).cast("long")),
        "doc_id", "n_tokens", seqLen = 512)),

    // TOKENIZER ENCODE — the missing last step of the BPE story
    // (train q207 → segment q213 → encode): the corpus as integer
    // token-id sequences under the trained table, ids dense 0..V-1 in
    // UTF-8 subword order (two-pass allocation, no global window).
    // The sequence itself never materializes: per-doc integer
    // checksums include the order-sensitive Σ(pos+1)·id, so the hash
    // pins the exact id stream — a transposition anywhere breaks it.
    // The oracle re-learns the table, replays the segmentation, and
    // recomputes positions from its own window cumsum.
    "q236_bpe_encode_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Bpe.encodeCorpusIds(docs, "doc_id", "text",
        graft.operators.Bpe.train(docs, "text", nMerges = 20))
    }),

    // BENCHMARK DECONTAMINATION (GPT-3 appendix C): training docs
    // sharing any 5-gram with the held-out eval slice, with
    // attribution (which benchmark item leaked). The eval gram side is
    // BROADCAST — benchmark-sized by definition — so the training side
    // streams map-side with no shuffle before the keyed count. n=4
    // fits this corpus's short documents (the 5-gram overlap set is
    // empty below sf0.1); the operator default is the paper's 13.
    "q237_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationPairs(
        docs.filter(col("doc_id") % 100 =!= 3),
        docs.filter(col("doc_id") % 100 === 3),
        "doc_id", "text", n = 4)
    }),

    // EXACTLY-ONCE store-maintaining stream ingest — the design the
    // other 16 twins deliberately avoid (they keep the store immutable
    // and park admissions in sink partitions): here each trigger
    // APPENDS its admitted documents into the committed band store
    // under a batch-id ledger (a `#batch=` header INSIDE the manifest
    // file whose rename is the commit point — dedup record and commit
    // are one atomic write), and the CompactionPolicy self-regulates
    // the L0 the stream grows. The require pins make the exactly-once
    // claims measured facts: the policy's re-base fired mid-stream
    // (gen back to 0 with both batch ids carried through the re-base),
    // and a re-delivered trigger — replayed directly against the store
    // — changes neither the generation nor the ledger. Gating semantics
    // are identical to q123 (corpus ∪ earlier admissions), so the
    // oracle is the same sequential admission chain; output = the
    // admitted ids as the store itself holds them.
    "q238_committed_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_band_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/bands$run"
      Dedup.saveBandIndexCommitted(
        Dedup.buildBandIndex(corpus, "doc_id", "text"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.bandIngestCommitted(s,
        landing.toString, idxDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      // the maxRuns=2 policy fired on the second trigger: history
      // re-based to generation 0 with the ledger carried forward
      require(Dedup.bandGen(s, idxDir) == 0L,
        "q238: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q238: both batch ids must survive the L0 re-base")
      // exactly-once: re-deliver trigger 1 straight at the store — the
      // ledger must swallow it (no append, no new generation)
      graft.streaming.DocumentStreams.bandIngestCommittedBatch(
        s, idxDir, policy)(docs.filter(col("doc_id") % 20 === 10), 1L)
      require(Dedup.bandGen(s, idxDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, idxDir)
            == Set(0L, 1L),
        "q238: a re-delivered batch must append nothing")
      Dedup.loadBandIndexSnapshot(s, idxDir).sets
        .filter(col("id") % 10 === 0).select(col("id").as("doc_id"))
    }),

    // WHOLE-DOCUMENT BIN PACKING (the SFT layout: sequences never
    // cross document boundaries) — q235's complement. Exact
    // first-fit-decreasing is inherently sequential, so this is the
    // class-based (harmonic) relaxation: slot count k = ⌊C/n⌋,
    // same-class docs pack k per bin in (n desc, id) order, bins
    // number densely across classes. Every bin except possibly the
    // last of each class is > C/2 full (harmonic ≤ 2× OPT bound);
    // the plan is ONE global range sort (two-phase index, no
    // single-partition window) + a ≤-C-row driver class fold. The
    // oracle replays the identical arithmetic from its own window
    // rank, so the hash pins every placement.
    "q239_bin_packing" -> ((s, dir) =>
      graft.operators.Layout.packBins(
        t(s, dir, "documents").withColumn("n_tokens",
          TextAnalysis.tokenCount(col("text")).cast("long")),
        "doc_id", "n_tokens", capacity = 128)),

    // ZONE-MAP FILE SKIPPING on a committed serve — the data-skipping
    // half of the pruning story (q164/PruningSpec pinned partition
    // pruning; this row pins per-file (min, max) envelopes): three
    // range-disjoint commits (the id-correlated ingest every store
    // sees when ids grow with time) each carry their files' doc_id
    // envelopes as `#stat=` lines INSIDE the manifest commit, and the
    // ranged serve drops non-overlapping files from the scan list at
    // plan time — Spark never lists, opens, or footer-reads them
    // (PruningSpec holds the measured byte arithmetic; the require
    // here pins the file-set arithmetic in-row). Scoring contract:
    // candidates restricted BEFORE the top-k (a post-filtered k-list
    // under-returns), global stats keep corpus-level idf/avgdl, df is
    // hit-derived — the oracle replays exactly that split.
    "q240_zonemap_range_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxDir = scratchDir("graft_postings_zonemap", dir)
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      val c1 = mx / 2; val c2 = (mx * 3) / 4
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(
          docs.filter(col("doc_id") <= c1), "doc_id", "text",
          nBuckets = 16), idxDir)
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
        "doc_id", "text")
      graft.operators.Retrieval.appendPostingsIndexCommitted(s, idxDir,
        docs.filter(col("doc_id") > c2), "doc_id", "text")
      // plan-time file-set arithmetic: the range keeps a strict
      // minority of the committed postings files (base + first append
      // have provably disjoint envelopes)
      val all = graft.operators.StoreFiles.manifestPaths(s, idxDir)
        .filter(_.contains("/postings/"))
      val st = graft.operators.StoreFiles.fileStats(s, idxDir)
      val kept = all.filter { p =>
        st.get(p).flatMap(_.get("doc_id"))
          .forall { case (mn, mxv) => mxv >= c2 + 1 && mn <= mx }
      }
      require(kept.nonEmpty && kept.size * 2 <= all.size,
        s"q240: range kept ${kept.size} of ${all.size} committed files — " +
          "zone maps did not prune")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshotRange(
          s, idxDir, c2 + 1, mx),
        "qid", "qterms", k = 10)
    }),

    // EXACTLY-ONCE ledger on the POSTINGS store-maintaining twin —
    // q238's design on the second family, and the UNGATED one: every
    // streamed document appends postings + stats deltas into the
    // committed index under the batch-id ledger. Here the ledger is
    // the ONLY exactly-once mechanism (a re-delivered append would
    // double postings rows AND stats totals — visible as wrong BM25
    // scores, which is what the oracle would catch). The require pins:
    // the maxRuns=2 policy re-based mid-stream with both ids carried,
    // and a replayed trigger moves neither generation nor ledger.
    // Serve = the full corpus, so the oracle is the standard BM25
    // mirror.
    "q241_committed_postings_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_postings_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(corpus,
          "doc_id", "text"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.postingsIngestCommitted(s,
        landing.toString, idxDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(graft.operators.Retrieval.postingsGen(s, idxDir) == 0L,
        "q241: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q241: both batch ids must survive the L0 re-base")
      // exactly-once: re-deliver trigger 1 straight at the store
      graft.streaming.DocumentStreams.postingsIngestCommittedBatch(
        s, idxDir, policy)(docs.filter(col("doc_id") % 20 === 10), 1L)
      require(graft.operators.Retrieval.postingsGen(s, idxDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, idxDir)
            == Set(0L, 1L),
        "q241: a re-delivered batch must append nothing")
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // EXACTLY-ONCE ledger on the WINNOW store-maintaining twin — the
    // GATED shape (q215's partial-overlap admission chain) run as
    // q238's design: each trigger probes the committed snapshot
    // (corpus ∪ earlier ADMISSIONS — the chain runs through the store
    // itself), appends admitted fingerprints under the batch-id
    // ledger, and the policy self-regulates L0. Pins as q238/q241.
    // Output = the streamed admissions as the store holds them; the
    // oracle replays the sequential chain, restricted to documents
    // that fingerprint at all (a zero-fingerprint admission leaves no
    // trace in a fingerprint store, by construction).
    "q242_committed_winnow_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val base = scratchDir("graft_winnow_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/winnow$run"
      Dedup.saveWinnowIndexCommitted(
        Dedup.buildWinnowIndex(corpus, "doc_id", "text"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.winnowIngestCommitted(s,
        landing.toString, idxDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(Dedup.winnowGen(s, idxDir) == 0L,
        "q242: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q242: both batch ids must survive the L0 re-base")
      graft.streaming.DocumentStreams.winnowIngestCommittedBatch(
        s, idxDir, policy)(docs.filter(col("doc_id") % 20 === 10), 1L)
      require(Dedup.winnowGen(s, idxDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, idxDir)
            == Set(0L, 1L),
        "q242: a re-delivered batch must append nothing")
      Dedup.loadWinnowIndexSnapshot(s, idxDir).fps
        .filter(col("id") % 10 === 0)
        .select(col("id").as("doc_id")).distinct()
    }),

    // BPE AT REAL TOKENIZER SCALE — 32,768 merges (GPT-2's vocab
    // budget minus the byte alphabet), the claim q234's ~1k run
    // designed for but never exercised. No fixture table has the word
    // diversity, so the vocabulary is SYNTHESIZED deterministically
    // and scale-independently: 32,768 distinct 12-hex-char words
    // (md5 of a counter — DuckDB replays the same derivation), ~394k
    // symbol instances. The trainer is the INDEXED driver loop
    // (pair→postings index + delta-maintained counts: O(affected
    // words) per merge; the naive per-merge vocab scan would be ~34B
    // ops here). The oracle is the strongest available at this scale:
    // an algorithmically independent RECOUNT trainer (no incremental
    // state, whole-vocab batch passes) re-learns the table and must
    // agree rank-for-rank on all 32,768 rows — delta ≡ recount as an
    // oracle fact, not a spec-only claim. The require pins the full
    // merge count and the batching efficiency (≥ ~82 accepted merges
    // per round on average — measured 353 rounds; classic
    // one-merge-per-recount training would pay 32,768).
    "q243_bpe_32k_merges" -> ((s, dir) => {
      import s.implicits._
      val synth = s.range(0, 32768).select(
        substring(md5(concat(lit("bpe:"), col("id").cast("string"))),
          1, 12).as("w"))
      val (merges, rounds) = graft.operators.Bpe.trainBatchedCounted(
        synth, "w", nMerges = 32768, batchSize = 512, minCount = 1,
        overfetch = 16)
      require(merges.size == 32768,
        s"q243: expected 32768 merges, got ${merges.size}")
      require(rounds <= 400,
        s"q243: batching must compress rounds (<= 400), got $rounds")
      merges.map(m => (m.rank, m.a, m.b)).toDF("merge_rank", "a", "b")
    }),

    // THE CURATION CAPSTONE — every training-data-prep stage the
    // catalog proves alone, composed as ONE row under ONE oracle (the
    // q184 serving-stack analog for the curation side): minhash
    // near-dup components → keep the longest doc per cluster (q105) →
    // drop the held-out eval slice and every survivor sharing a
    // 4-gram with it (q237) → per-source cap 50 (q114) → temperature
    // mix α=0.5, budget 300 (q169) → 256-token concat-and-chunk
    // packing plan (q235) → deterministic train-order shuffle of the
    // CHUNKS (q115). Output = the final training shard layout: one
    // row per (chunk, doc span) with its (shard, position). What a
    // composition row buys that the per-stage oracles cannot:
    // interface drift between stages (a renamed column, a filter
    // applied to the wrong side, quotas computed over the wrong pool)
    // becomes oracle-visible, because the mirror replays the WHOLE
    // chain end-to-end.
    "q244_curation_capstone" -> ((s, dir) => {
      val mixed = graft.operators.Curation.temperatureMix(
        capstonePool(s, dir), "doc_id", "lang", alpha = 0.5, budget = 300L)
      val plan = graft.operators.Layout.packSequences(mixed, "doc_id",
        "n_tokens", seqLen = 256)
      val order = graft.operators.Curation.trainOrderShuffle(
          plan.select(col("chunk_id")).distinct(), "chunk_id", nShards = 8)
        .select(col("chunk_id"), col("shard"), col("position"))
      plan.join(broadcast(order), Seq("chunk_id"))
        .select(col("shard"), col("position"), col("chunk_id"),
          col("doc_id"), col("doc_off"), col("chunk_off"), col("len"))
    }),

    // AUTO-RETRAIN of the PQ CODEBOOKS — the model-side maintenance
    // policy (the CompactionPolicy idea applied to staleness the
    // coding-error ledger measures): an IN-distribution append must
    // NOT fire; a SHIFTED batch (every component ×4 — a scale
    // drift the seed codebooks code badly, while cosine geometry and
    // so neighbor structure are preserved) must fire
    // EXACTLY one retrain (full rebuild on the current corpus + a new
    // baseline), after which the same shifted distribution no longer
    // fires. The require chain pins that fire pattern; the output is
    // the serve against the retrained index, mirrored by the PQ oracle
    // generator trained on the same seed ∪ shifted mixture (the union
    // rendered as a SQL subquery). RecallAtScaleSpec additionally pins
    // recall-after ≥ recall-before on the shifted queries.
    "q245_pq_auto_retrain" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_pq_retrain", dir)
      val seed = emb.filter(col("vec_id") % 10 =!= 0)
      Similarity.savePqIndexCommitted(
        Similarity.buildPqIndex(seed, "vec_id", "embedding"), idxDir)
      Similarity.recordPqBaseline(s, idxDir, seed, "vec_id", "embedding")
      // 250%: the post-retrain baseline averages BOTH populations'
      // coding error, and the x4 population's sits naturally far above
      // the original's — the threshold must clear that mixture ratio
      // (~1.9 measured) while still catching the stale-codebook blowup
      val policy = Similarity.RetrainPolicy(maxRatioPct = 250)
      val inDist = emb.filter(col("vec_id") % 10 === 0)
      Similarity.appendPqIndexCommitted(s, idxDir, inDist,
        "vec_id", "embedding")
      require(!Similarity.maintainPqCodebooks(s, idxDir, inDist, emb,
          "vec_id", "embedding", policy),
        "q245: an in-distribution batch must not trigger a retrain")
      val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => x + lit(0.0)).as("embedding"))
      val shifted = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(4.0)).as("embedding"))
      val full = base.unionByName(shifted)
      Similarity.appendPqIndexCommitted(s, idxDir, shifted,
        "vec_id", "embedding")
      require(Similarity.maintainPqCodebooks(s, idxDir, shifted, full,
          "vec_id", "embedding", policy),
        "q245: the shifted batch must trigger the retrain")
      require(!Similarity.maintainPqCodebooks(s, idxDir, shifted, full,
          "vec_id", "embedding", policy),
        "q245: after the retrain the shifted distribution must not re-fire")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndexSnapshot(s, idxDir),
        "vec_id", "embedding", k = 10)
    }),

    // The TRUE ExactSubstr span relation (Lee et al. 2021) at UNBOUNDED
    // span length: distributed prefix-doubling suffix ranks over the
    // sentinel-separated global token stream (rounds bound by log of
    // the longest DOCUMENT, not the corpus — per-doc unique sentinels
    // force resolution at the doc boundary), exact LCPs by binary
    // lifting over the retained rank levels, dup_len(p) = max LCP with
    // the two rank-adjacent suffixes, islands merged per doc. q210's
    // fixed-5-gram spans chain unrelated repeats and can't say how long
    // the shared substring actually is; here every span is the exact
    // maximal extent of a substring occurring >= 2x corpus-wide.
    "q246_suffix_dup_spans" -> ((s, dir) =>
      graft.operators.Suffix.maximalDupSpansFrom(
        suffixStore(s, dir), "doc_id", minLen = 8L)),

    // ZONE-MAP ranged serve on the PQ family — q240's measured
    // file-skipping story on a SECOND family (the ANN side): the codes
    // store commits in three id-range-disjoint batches (base trains
    // the quantizers; appends encode with the stored codebooks), and a
    // serve restricted to the top-quarter id range loads through
    // [[Similarity.loadPqIndexSnapshotRange]] — files whose committed
    // neighbor_id envelope misses the range never enter the scan (the
    // in-row require pins the file-set arithmetic), and the serve is
    // exactly q129's filtered-search contract: candidates restricted
    // BEFORE the top-k, disallowed rows never reach the ADC expression.
    "q247_pq_zonemap_range_serve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxDir = scratchDir("graft_pq_zonemap", dir)
      val mx = emb.agg(max(col("vec_id"))).head().getLong(0)
      val c1 = mx / 2; val c2 = (mx * 3) / 4
      Similarity.savePqIndexCommitted(
        Similarity.buildPqIndex(emb.filter(col("vec_id") <= c1),
          "vec_id", "embedding"), idxDir)
      Similarity.appendPqIndexCommitted(s, idxDir,
        emb.filter(col("vec_id") > c1 && col("vec_id") <= c2),
        "vec_id", "embedding")
      Similarity.appendPqIndexCommitted(s, idxDir,
        emb.filter(col("vec_id") > c2), "vec_id", "embedding")
      val all = graft.operators.StoreFiles.manifestPaths(s, idxDir)
        .filter(_.contains("/codes/"))
      val st = graft.operators.StoreFiles.fileStats(s, idxDir)
      val kept = all.filter { p =>
        st.get(p).flatMap(_.get("neighbor_id"))
          .forall { case (mn, mxv) => mxv >= c2 + 1 && mn <= mx }
      }
      require(kept.nonEmpty && kept.size * 2 <= all.size,
        s"q247: range kept ${kept.size} of ${all.size} committed codes " +
          "files — zone maps did not prune")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndexSnapshotRange(s, idxDir, c2 + 1, mx),
        "vec_id", "embedding", k = 10)
    }),

    // EXACTLY-ONCE ledger on the IVF store-maintaining twin — with
    // this and q249, EVERY store-maintaining streaming ingest runs
    // under the batch-id ledger (bands q238, postings q241, winnow
    // q242, IVF, PQ). Ungated like q241: each trigger routes the drop
    // with the STORED centroids and appends assignments INTO the
    // committed store; maxRuns=2 forces an L0 re-base mid-stream; the
    // requires pin gen-0 after re-base, both batch ids surviving it,
    // and a replayed trigger appending nothing. Serve = q151's search
    // over the identical corpus ⇒ identical oracle.
    "q248_committed_ivf_ingest" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = scratchDir("graft_ivf_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      Similarity.saveIvfIndexCommitted(
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.ivfIngestCommitted(s,
        landing.toString, idxDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        emb.filter(col("vec_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(Similarity.ivfGen(s, idxDir) == 0L,
        "q248: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q248: both batch ids must survive the L0 re-base")
      graft.streaming.DocumentStreams.ivfIngestCommittedBatch(
        s, idxDir, policy)(emb.filter(col("vec_id") % 20 === 10), 1L)
      require(Similarity.ivfGen(s, idxDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, idxDir)
            == Set(0L, 1L),
        "q248: a re-delivered batch must append nothing")
      Similarity.ivfSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadIvfIndexSnapshot(s, idxDir),
        "vec_id", "embedding", k = 10)
    }),

    // q248's design on the PQ family (drops encode with the STORED
    // codebooks — zero training jobs — and append into the committed
    // codes under the ledger). Same train/search split as q150 ⇒ same
    // oracle.
    "q249_committed_pq_ingest" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val base = scratchDir("graft_pq_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      Similarity.savePqIndexCommitted(
        Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.pqIngestCommitted(s,
        landing.toString, idxDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        emb.filter(col("vec_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(Similarity.pqGen(s, idxDir) == 0L,
        "q249: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q249: both batch ids must survive the L0 re-base")
      graft.streaming.DocumentStreams.pqIngestCommittedBatch(
        s, idxDir, policy)(emb.filter(col("vec_id") % 20 === 10), 1L)
      require(Similarity.pqGen(s, idxDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, idxDir)
            == Set(0L, 1L),
        "q249: a re-delivered batch must append nothing")
      Similarity.pqSearchIndex(emb.filter(col("vec_id") % 25 === 0),
        Similarity.loadPqIndexSnapshot(s, idxDir),
        "vec_id", "embedding", k = 10)
    }),

    // The ExactSubstr APPLY step at unbounded length (q246's spans as
    // a per-doc token charge) under the REMOVE-ALL-COPIES policy —
    // what Lee et al.'s released tool does; q212 keeps one canonical
    // copy but only at fixed gram width. The exact per-doc
    // trimmed/kept counts a curation pipeline budgets with.
    "q250_suffix_trim" -> ((s, dir) =>
      graft.operators.Suffix.trimDupSpansAllFrom(
        suffixStore(s, dir), "doc_id", minLen = 8L)),

    // The BOILERPLATE REPORT: the 20 longest maximal duplicated spans
    // with their extracted text — the auditor artifact (license
    // headers, chrome, templated paragraphs surface here first).
    // ORDER BY + LIMIT plans as TakeOrderedAndProject.
    "q251_boilerplate_report" -> ((s, dir) =>
      graft.operators.Suffix.longestDupSpansFrom(suffixStore(s, dir),
        t(s, dir, "documents"), "doc_id", "text", minLen = 8L, k = 20)),

    // EXACTLY-ONCE ledger on the AGGREGATE store-maintaining twin —
    // the last maintaining family without it (bands q238, postings
    // q241, winnow q242, IVF q248, PQ q249; with this, ALL of them).
    // The quiet failure the ledger prevents here is the worst of the
    // six: a re-delivered delta batch merges into a PLAUSIBLE
    // aggregate that silently double-counts. maxRuns=2 forces an L0
    // re-base mid-stream (delta runs collapse to one row per key —
    // the same associative merge the serve applies); the requires pin
    // gen-0, ledger survival, and replay-appends-nothing. Serve over
    // seed ∪ both drops = the full corpus ⇒ q143's oracle.
    "q252_committed_agg_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_agg_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val mvDir = s"$base/mv$run"
      graft.operators.MatView.saveAggStateCommitted(
        graft.operators.MatView.buildAggState(
          docs.filter(col("doc_id") % 10 =!= 0)
            .withColumn("tok", size(split(col("text"), " ")).cast("long")),
          Seq("lang", "source"), "tok"),
        mvDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.aggIngestCommitted(s,
        landing.toString, mvDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(graft.operators.MatView.aggGen(s, mvDir) == 0L,
        "q252: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, mvDir)
          == Set(0L, 1L),
        "q252: both batch ids must survive the L0 re-base")
      graft.streaming.DocumentStreams.aggIngestCommittedBatch(
        s, mvDir, policy)(docs.filter(col("doc_id") % 20 === 10), 1L)
      require(graft.operators.MatView.aggGen(s, mvDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, mvDir)
            == Set(0L, 1L),
        "q252: a re-delivered batch must append nothing")
      graft.operators.MatView.serveAgg(
        graft.operators.MatView.loadAggStateSnapshot(s, mvDir))
    }),

    // The ExactSubstr APPLY step under the exact KEEP-FIRST-OCCURRENCE
    // policy (the paper text's "keep one copy", canonical under the
    // (doc, pos) stream order): prev_len(p) = longest prefix of
    // suffix p occurring at a strictly earlier global position,
    // computed by the distributed ANSV descend — ONE set of sparse
    // (min-gpos, min-LCP) tables by doubling over the suffix-array
    // order, then left+right nearest-smaller-gpos walks against them
    // (each the same conditional-join descend as the LCP lift). q250
    // removes every copy (the released tool's policy); here the
    // corpus-wide first occurrence of every duplicated substring
    // survives untouched — identical twin documents keep exactly one
    // full copy.
    "q253_suffix_keep_first" -> ((s, dir) =>
      graft.operators.Suffix.trimDupSpansKeepFirstFrom(
        suffixStore(s, dir), "doc_id", minLen = 8L)),

    // The keep-first APPLY step MATERIALIZED: the cleaned corpus
    // itself — every later occurrence of a duplicated substring of
    // >= 8 tokens spliced out, the corpus-wide first occurrence kept
    // verbatim (q253 reports the token charge; this row ships the
    // artifact a pipeline trains on). Served from the suffix store:
    // spans expand to covered positions (output-linear), the token
    // stream anti-joins them, ONE ordered per-doc aggregation splices.
    "q254_suffix_clean_text" -> ((s, dir) =>
      graft.operators.Suffix.trimDupSpansKeepFirstText(suffixStore(s, dir),
        t(s, dir, "documents"), "doc_id", "text", minLen = 8L)),

    // CAPSTONE v2 — the q244 chain with the EXACT-SUBSTRING keep-first
    // trim (q253/q254's suffix ANSV) inserted between dedup and
    // decontamination: dedup keep-best -> exact trim ON THE SURVIVOR
    // CORPUS (prev_len must be computed against what dedup kept, or
    // "first occurrence" could point at a removed duplicate) ->
    // decontaminate the TRIMMED text -> source cap -> temperature mix
    // -> pack -> chunk shuffle. This is the Lee et al. 2021 pipeline
    // order as real curation runs it; the oracle replays the WHOLE
    // chain including the ANSV and the splice.
    "q255_capstone_exact_trim" -> ((s, dir) => {
      val mixed = graft.operators.Curation.temperatureMix(
        capstonePoolExact(s, dir), "doc_id", "lang", alpha = 0.5,
        budget = 300L)
      val plan = graft.operators.Layout.packSequences(mixed, "doc_id",
        "n_tokens", seqLen = 256)
      val order = graft.operators.Curation.trainOrderShuffle(
          plan.select(col("chunk_id")).distinct(), "chunk_id", nShards = 8)
        .select(col("chunk_id"), col("shard"), col("position"))
      plan.join(broadcast(order), Seq("chunk_id"))
        .select(col("shard"), col("position"), col("chunk_id"),
          col("doc_id"), col("doc_off"), col("chunk_off"), col("len"))
    }),

    // STRING ZONE MAPS, measured — the r12 verdict's open question
    // closed with a row on the DOCSTORE family (#12, the committed
    // "bronze table"): the corpus commits range-clustered on
    // (source, doc_id), each file's UTF-8 source envelope rides the
    // manifest, and a serve restricted to ONE source prunes its
    // committed file list at PLAN time (the require pins the file-set
    // arithmetic — a strict minority of files may enter the scan).
    // Output: that source's per-language length profile, mirrored by a
    // plain WHERE source = min(source) oracle.
    "q256_docstore_source_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val storeDir = docStoreDir(s, dir)
      val src = docs.agg(min(col("source"))).head().getString(0)
      val all = graft.operators.StoreFiles.manifestPaths(s, storeDir)
        .filter(_.contains("/docs/"))
      val st = graft.operators.StoreFiles.fileStringStats(s, storeDir)
      val srcB = src.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val kept = all.filter { p =>
        st.get(p).flatMap(_.get("source")).forall { case (mn, mx) =>
          java.util.Arrays.compareUnsigned(mx, srcB) >= 0 &&
            java.util.Arrays.compareUnsigned(mn, srcB) <= 0
        }
      }
      require(kept.nonEmpty && kept.size * 2 <= all.size,
        s"q256: source range kept ${kept.size} of ${all.size} committed " +
          "files — string zone maps did not prune")
      graft.operators.DocStore.loadDocStoreSourceRange(s, storeDir, src, src)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
    }),

    // RANGED AUDIT on the SUFFIX STORE — family #11's zone maps doing
    // real work: the maximal-span report restricted to the top-quarter
    // doc_id range reads ONLY the committed duplens files whose doc_id
    // envelope can hit it (kept-file arithmetic require'd in-row; the
    // save is range-clustered so envelopes are disjoint). Sound by
    // construction: dup_len is a CORPUS-GLOBAL value baked at build
    // time, so the restriction picks which documents are audited,
    // never what the lengths mean — the oracle computes global spans
    // and filters to the same bound.
    "q257_suffix_ranged_audit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sd = suffixStoreDir(s, dir)
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      val lo = (mx * 3) / 4 + 1
      val all = graft.operators.StoreFiles.manifestPaths(s, sd)
        .filter(_.contains("/duplens/"))
      val st = graft.operators.StoreFiles.fileStats(s, sd)
      val kept = all.filter { p =>
        st.get(p).flatMap(_.get("doc_id"))
          .forall { case (mn, mxv) => mxv >= lo && mn <= mx }
      }
      require(kept.nonEmpty && kept.size * 2 <= all.size,
        s"q257: doc range kept ${kept.size} of ${all.size} committed " +
          "duplens files — suffix zone maps did not prune")
      graft.operators.Suffix.maximalDupSpansFrom(
        graft.operators.Suffix.loadDupIndexIdRange(s, sd, lo, mx),
        "doc_id", minLen = 8L)
    }),

    // EXACTLY-ONCE ledger on the RAW-DOCUMENT store (family #12) — the
    // bronze table itself gains the streamed ingest every DERIVED store
    // already has (q238/q241/q242/q248/q249/q252), completing the lake
    // end-to-end: raw landing → committed bronze → derived builds. The
    // quiet failure the ledger prevents here is the worst in the repo:
    // a re-delivered ingest batch silently duplicates the DOCUMENTS
    // themselves, and every downstream store bakes the duplicates in.
    // maxRuns=2 forces a clustered L0 re-base mid-stream (the re-base
    // restores the (source, doc_id) zone-map envelopes the per-batch
    // files lose); the requires pin gen-0 re-base, ledger survival,
    // and replay-appends-nothing. Serve over seed ∪ both drops = the
    // full corpus ⇒ a plain per-source profile oracle.
    "q258_committed_doc_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = scratchDir("graft_doc_cstream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val storeDir = s"$base/store$run"
      graft.operators.DocStore.saveDocStoreCommitted(s, storeDir,
        docs.filter(col("doc_id") % 10 =!= 0), numFiles = 8)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.docIngestCommitted(s,
        landing.toString, storeDir, s"$base/ckpt$run", policy,
        maxFilesPerTrigger = Some(1))
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        docs.filter(col("doc_id") % 20 === m).coalesce(1)
          .write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(graft.operators.DocStore.docStoreGen(s, storeDir) == 0L,
        "q258: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, storeDir)
          == Set(0L, 1L),
        "q258: both batch ids must survive the L0 re-base")
      graft.streaming.DocumentStreams.docIngestCommittedBatch(
        s, storeDir, policy)(docs.filter(col("doc_id") % 20 === 10), 1L)
      require(graft.operators.DocStore.docStoreGen(s, storeDir) == 0L &&
          graft.operators.StoreFiles.committedBatchIds(s, storeDir)
            == Set(0L, 1L),
        "q258: a re-delivered batch must append nothing")
      graft.operators.DocStore.loadDocStoreSnapshot(s, storeDir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
    }),

    // REBUILD POLICY for the build-once suffix store (family #11) —
    // q245's auto-retrain shape on the family with NO sound
    // incremental append: the store records its corpus provenance
    // (docstore generation + committed bytes) at build, and the
    // staleness probe is pure driver FS metadata. The full drift
    // lifecycle (build → no-fire → grow 10% past the 5% policy →
    // fire exactly once → no re-fire) runs on FIRST TOUCH per
    // JVM+corpus ([[suffixRebuildDirs]] — the family #11/#13 pattern;
    // the bench warmup absorbs its two builds, and the fixture twin in
    // ManifestFamiliesSpec pins the same chain every test run). Every
    // EXECUTION then re-asserts the steady state the policy exists
    // for: the maintenance tick on an un-drifted corpus costs ZERO
    // jobs (CompactionPolicy.l0Stats economics), and the serve reads
    // the post-rebuild index ⇒ the full-corpus q246 oracle.
    "q259_suffix_rebuild_policy" -> ((s, dir) => {
      val (dsDir, sxDir) = suffixRebuildDirs(s, dir)
      require(!graft.operators.Suffix.maintainDupIndexRebuild(s, sxDir,
          dsDir, rebuildPolicy, numFiles = 8),
        "q259: the un-drifted steady state must not re-fire")
      graft.operators.Suffix.maximalDupSpansFrom(
        graft.operators.Suffix.loadDupIndexSnapshot(s, sxDir),
        "doc_id", minLen = 8L)
    }),

    // BRONZE→SILVER LINEAGE at a PINNED GENERATION: a derived store
    // (BM25 postings) built FROM the committed docstore's generation-0
    // snapshot AFTER the bronze table has moved on to generation 1 —
    // the reproducible-rebuild contract a lake audit needs ("rebuild
    // the index exactly as it stood last Tuesday"). The serve must
    // rank identically to a corpus that never held the gen-1 append,
    // which is exactly the restricted BM25 mirror.
    "q260_lineage_pinned_build" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val dsDir = scratchDir("graft_lineage_ds", dir)
      val idxDir = scratchDir("graft_lineage_idx", dir)
      graft.operators.DocStore.saveDocStoreCommitted(s, dsDir,
        docs.filter(col("doc_id") % 10 =!= 0), numFiles = 8)
      graft.operators.DocStore.appendDocStoreCommitted(s, dsDir,
        docs.filter(col("doc_id") % 10 === 0))
      require(graft.operators.DocStore.docStoreGen(s, dsDir) == 1L,
        "q260: the bronze table must have moved past the pinned gen")
      val pinned = graft.operators.DocStore.loadDocStoreSnapshot(
        s, dsDir, asOf = Some(0L))
      graft.operators.Retrieval.savePostingsIndexCommitted(
        graft.operators.Retrieval.buildPostingsIndex(pinned,
          "doc_id", "text"), idxDir)
      val queries = docs.filter(col("doc_id") % 200 === 7)
        .select(col("doc_id").as("qid"),
          array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
      graft.operators.Retrieval.bm25SearchIndex(queries,
        graft.operators.Retrieval.loadPostingsIndexSnapshot(s, idxDir),
        "qid", "qterms", k = 10)
    }),

    // SEMANTIC benchmark decontamination — the embedding-level sibling
    // of q83's n-gram rule (paraphrased eval items share no gram with
    // a training doc; they DO share an embedding neighborhood): flag
    // corpus vectors within cosine 0.30 of ANY eval vector (eval slice
    // = vec_id % 25, q54's query-side convention), with the hit count
    // and closest eval item per flagged doc. The eval side BROADCASTS
    // (an eval suite is bounded by definition — the q83 contract);
    // the corpus scan never shuffles its vectors, only one aggregate
    // row per flagged doc moves. Exact by contract: a decontamination
    // miss is eval leakage, so no ANN shortlist substitutes here.
    "q261_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticContamination(
        emb.filter(col("vec_id") % 25 =!= 0),
        emb.filter(col("vec_id") % 25 === 0),
        "vec_id", "embedding", tau = 0.30)
    }),

    // DISTILLED QUALITY FILTER (the GPT-3 Appendix A / FineWeb-edu
    // recipe): an expensive per-doc teacher signal (unique-token
    // ratio in exact micros — standing in for an LLM judge's grade)
    // is distilled into a cheap linear proxy over hashed-unigram
    // bucket counts + length (one scan-linear pass), ridge-fit on the
    // 90% train split; the held-out 10% is then scored by the
    // micro-literal weights and GATED at predicted ratio ≥ 0.5. The
    // fit's moment pass shuffles p² scalars regardless of corpus
    // size; scoring is a codegen'd integer dot product. The oracle
    // refits deterministically and replays the SAME literals.
    "q262_quality_distill" -> ((s, dir) => {
      // pinned: features feed the moment pass AND the held-out scoring
      // — without the pin the tokenize+aggregate pass runs twice
      val feats = graft.operators.Classify.distillQualityFeatures(
        t(s, dir, "documents"), "doc_id", "text", nBuckets = 8)
        .localCheckpoint()
      val fit = graft.operators.Regression.fitRidge(
        feats.filter(col("doc_id") % 10 =!= 0), "y_micro",
        Seq("n_tokens") ++ (0 until 8).map(j => s"f$j"), lambda = 1e4)
      graft.operators.Regression.scoreResiduals(
          feats.filter(col("doc_id") % 10 === 0), "y_micro", fit)
        .withColumn("kept",
          (col("pred_micro") >= lit(500000L * 1000000L)).cast("int"))
        .select(col("doc_id"), col("n_tokens"), col("y_micro"),
          col("pred_micro"), col("kept"))
    }),

    // THE DISTILLED FILTER'S OWN EVAL (q222's discipline applied to
    // q262: no filter threshold is trusted before its AUC): per-source
    // ROC-AUC of the cheap proxy's score against the TEACHER'S verdict
    // (ratio ≥ 0.5) on the held-out split the fit never saw — does
    // the distilled ranking agree with the expensive signal where it
    // will actually be used? Exact Mann-Whitney integers (q222's
    // arithmetic); a one-class source reports NULL, never a guess.
    "q263_distill_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val feats = graft.operators.Classify.distillQualityFeatures(
        docs, "doc_id", "text", nBuckets = 8).localCheckpoint()
      val fit = graft.operators.Regression.fitRidge(
        feats.filter(col("doc_id") % 10 =!= 0), "y_micro",
        Seq("n_tokens") ++ (0 until 8).map(j => s"f$j"), lambda = 1e4)
      val scored = graft.operators.Regression.scoreResiduals(
          feats.filter(col("doc_id") % 10 === 0), "y_micro", fit)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"), col("pred_micro").as("score"),
          (col("y_micro") >= 500000L).cast("int").as("label"))
      graft.operators.Classify.rocAuc(scored, Seq("source"),
        "score", "label")
    }),

    // SEMANTICALLY-GATED vector ingest — q261's decontamination rule
    // moved to INGEST TIME, as the 5th gate family on the committed
    // stores (band/SimHash/Bloom/winnow gate on content duplication;
    // this gates on eval proximity): a clean IVF seed is committed,
    // then two streamed drops are each probed against the broadcast
    // eval slice and vectors within cosine 0.30 are REJECTED at the
    // door; admitted vectors route with the STORED centroids (zero
    // training jobs) under the exactly-once batch ledger, the policy
    // re-bases L0 mid-stream with both ids carried, and a re-delivered
    // batch appends nothing — the early ledger probe skips even the
    // gate's jobs. Serve = eval-slice ANN over the committed snapshot;
    // the mirror searches ONLY the decontaminated corpus, so one
    // leaked vector (or a doubled replay) is hash-visible.
    "q264_semantic_gated_ingest" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val evalSet = emb.filter(col("vec_id") % 25 === 0)
      val base = scratchDir("graft_semgate_stream", dir)
      val run = streamRuns.incrementAndGet()
      val landing = new java.io.File(s"$base/landing$run")
      landing.mkdirs()
      val idxDir = s"$base/idx$run"
      val seed = emb.filter(
        col("vec_id") % 10 =!= 0 && col("vec_id") % 25 =!= 0)
      Similarity.saveIvfIndexCommitted(
        Similarity.buildIvfIndex(seed, "vec_id", "embedding"), idxDir)
      val policy = graft.operators.CompactionPolicy(maxRuns = 2)
      val q = graft.streaming.DocumentStreams.semanticIvfIngestCommitted(
        s, landing.toString, idxDir, s"$base/ckpt$run", evalSet,
        tau = 0.30, policy, maxFilesPerTrigger = Some(1))
      def drop(m: Int) = emb.filter(
        col("vec_id") % 20 === m && col("vec_id") % 25 =!= 0)
      for ((m, i) <- Seq(0, 10).zipWithIndex) {
        val stage = s"$base/stage$run-$i"
        drop(m).coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$stage/$part"),
          java.nio.file.Paths.get(s"$landing/drop_0$i.parquet"))
        q.processAllAvailable()
      }
      q.stop()
      require(Similarity.ivfGen(s, idxDir) == 0L,
        "q264: the compaction policy must have re-based mid-stream")
      require(graft.operators.StoreFiles.committedBatchIds(s, idxDir)
          == Set(0L, 1L),
        "q264: both batch ids must survive the L0 re-base")
      // the gate did real work: the store holds strictly fewer vectors
      // than seed + drops, and strictly more than the seed alone
      val stored = Similarity.loadIvfIndexSnapshot(s, idxDir)
        .assignments.count()
      val nSeed = seed.count()
      val nDrops = drop(0).count() + drop(10).count()
      require(stored > nSeed && stored < nSeed + nDrops,
        s"q264: gate vacuous — stored=$stored seed=$nSeed drops=$nDrops")
      // a re-delivered batch appends nothing (the ledger probe fires
      // before the gate even runs)
      graft.streaming.DocumentStreams.semanticIvfIngestCommittedBatch(
        s, idxDir, evalSet, 0.30, policy)(drop(10), 1L)
      require(Similarity.ivfGen(s, idxDir) == 0L &&
          Similarity.loadIvfIndexSnapshot(s, idxDir)
            .assignments.count() == stored,
        "q264: a re-delivered batch must append nothing")
      Similarity.ivfSearchIndex(evalSet,
        Similarity.loadIvfIndexSnapshot(s, idxDir),
        "vec_id", "embedding", k = 10)
    }),

    // TRUSTRANK (Gyöngyi et al. VLDB'04) over q190's bipartite
    // customer↔supplier graph: teleport mass lands ONLY on a curated
    // supplier whitelist (s_suppkey % 10 — a table-derived seed set,
    // joined, never collected), so trust decays with link distance
    // from the whitelist — the crawl-quality / link-spam-demotion
    // signal of web corpus curation (high PageRank + low TrustRank =
    // the classic spam shape). Same pinned-edge/one-exchange-per-round
    // execution and floor-integer arithmetic as q190; the mirror
    // unrolls the same iterations with the seed-biased teleport.
    "q265_trustrank" -> ((s, dir) => {
      val fwd = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.union(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 10 === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      graft.operators.Graph.trustRank(edges, "src", "dst", seeds,
          iters = 6)
        .orderBy(col("trust").desc, col("node").asc)
        .limit(20)
    })
  )

  /** The suffix duplication index (store family #11) for a corpus dir,
    * built + committed ONCE per JVM and scale — whichever suffix row
    * runs first pays the build; every other row (and every later pass
    * of the same row) serves from the committed store with ZERO
    * positions/doubling/ANSV jobs. This is the lifecycle the family
    * exists for: build nightly, audit always.
    */
  /** The committed raw-document store (family #12) for a corpus dir,
    * built + committed ONCE per JVM and scale under the same per-JVM
    * lock discipline as [[suffixStoreDir]] — two concurrent first
    * touches must not both run the save and race clearLedger/commit
    * on the same scratch dir.
    */
  private val docStoreLock = new Object
  private def docStoreDir(s: SparkSession, dir: String): String =
    docStoreLock.synchronized {
      val sd = scratchDir("graft_docstore", dir)
      if (graft.operators.DocStore.docStoreGen(s, sd) < 0L)
        graft.operators.DocStore.saveDocStoreCommitted(s, sd,
          t(s, dir, "documents"), numFiles = 8)
      sd
    }

  /** q259's drift lifecycle, run ONCE per JVM+corpus: commit the
    * bronze docstore at 90% of the corpus, build the suffix store FROM
    * it (provenance recorded), assert the policy's no-fire, append the
    * remaining 10% (past the 5% threshold), assert fire-exactly-once
    * and no-refire. Returns (docstore dir, suffix-store dir) with the
    * store covering the FULL corpus — every later execution pays only
    * the zero-job staleness probe + the serve.
    */
  private val rebuildPolicy =
    graft.operators.Suffix.RebuildPolicy(maxAppendedFraction = 0.05)
  private val suffixRebuildLock = new Object
  private def suffixRebuildDirs(s: SparkSession,
      dir: String): (String, String) = suffixRebuildLock.synchronized {
    val dsDir = scratchDir("graft_sfx_corpus", dir)
    val sxDir = scratchDir("graft_sfx_rebuild", dir)
    if (graft.operators.Suffix.dupIndexGen(s, sxDir) < 0L) {
      val docs = t(s, dir, "documents")
      graft.operators.DocStore.saveDocStoreCommitted(s, dsDir,
        docs.filter(col("doc_id") % 10 =!= 0), numFiles = 8)
      graft.operators.Suffix.saveDupIndexFromDocStore(s, sxDir, dsDir,
        numFiles = 8)
      require(!graft.operators.Suffix.maintainDupIndexRebuild(s, sxDir,
          dsDir, rebuildPolicy, numFiles = 8),
        "q259: an unchanged corpus must not trigger a rebuild")
      graft.operators.DocStore.appendDocStoreCommitted(s, dsDir,
        docs.filter(col("doc_id") % 10 === 0))
      require(graft.operators.Suffix.maintainDupIndexRebuild(s, sxDir,
          dsDir, rebuildPolicy, numFiles = 8),
        "q259: the grown corpus must trigger the rebuild")
      require(!graft.operators.Suffix.maintainDupIndexRebuild(s, sxDir,
          dsDir, rebuildPolicy, numFiles = 8),
        "q259: after the rebuild the same corpus must not re-fire")
    }
    (dsDir, sxDir)
  }

  private val suffixStoreLock = new Object
  private def suffixStoreDir(s: SparkSession, dir: String): String =
    suffixStoreLock.synchronized {
      val sd = scratchDir("graft_suffix_store", dir)
      if (graft.operators.Suffix.dupIndexGen(s, sd) < 0L)
        graft.operators.Suffix.saveDupIndexCommitted(s, sd,
          t(s, dir, "documents"), "doc_id", "text", numFiles = 8)
      sd
    }
  private def suffixStore(s: SparkSession,
      dir: String): graft.operators.Suffix.DupIndex =
    graft.operators.Suffix.loadDupIndexSnapshot(s, suffixStoreDir(s, dir))

  /** The SURVIVOR-TRIM store (family #13) for a corpus dir — the r13
    * verdict's Missing #1 closed: q255's trim stage was the last
    * compute-heavy artifact rebuilt per execution. Built + committed
    * ONCE per JVM and scale; whichever capstone execution runs first
    * pays the dedup chain + the survivor-corpus suffix construction
    * (the bench warmup absorbs it), and every later execution serves
    * the trim AND the splice from the committed relations with ZERO
    * minhash/dedup/suffix-construction jobs. The store is keyed by
    * the DEDUP STAGE'S OUTPUT by construction: the committed `surv`
    * sub IS that output (deterministic for a corpus dir), and the
    * index is built over it alone — "first occurrence" stays
    * survivor-relative, exactly as the inline build computed it.
    */
  private val survTrimStoreLock = new Object

  /** Fingerprint of the dedup configuration behind the survivor-trim
    * store: the minHashLshPairs defaults the build uses plus the
    * keep-best policy key. Recorded as a `#survparams=` manifest
    * header at save and ASSERTED at every load — if a future round
    * changes any of these knobs, the store rebuilds instead of
    * silently serving survivors of the old configuration (the r14
    * round-notes residual closed).
    */
  private val survTrimParamsFp =
    "minhash:shingle=3,hashes=12,rowsPerBand=2,threshold=0.5;" +
      "keep=best:n_tokens"
  private def survTrimStoreDir(s: SparkSession, dir: String): String =
    survTrimStoreLock.synchronized {
      val sd = scratchDir("graft_survtrim_store", dir)
      val stale = graft.operators.Suffix.survTrimGen(s, sd) >= 0L &&
        !graft.operators.Suffix.survTrimParams(s, sd)
          .contains(survTrimParamsFp)
      if (graft.operators.Suffix.survTrimGen(s, sd) < 0L || stale) {
        val docs = t(s, dir, "documents")
          .withColumn("n_tokens",
            TextAnalysis.tokenCount(col("text")).cast("long"))
        val cache = new Dedup.CacheHandle()
        val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
            cache = cache)
          .select(col("id_a"), col("id_b"))
        // pinned: the survivor set feeds the index build and the surv
        // write — without the pin each re-runs the dedup chain
        val surv = Dedup.dedupByComponentsBest(docs, "doc_id", pairs,
          col("n_tokens"), upstream = cache).localCheckpoint()
        graft.operators.Suffix.saveSurvTrimCommitted(s, sd, surv,
          "doc_id", "text", numFiles = 8,
          params = Some(survTrimParamsFp))
      }
      sd
    }

  /** The v2 capstone pool (stages 1–5 of q255): dedup keep-best →
    * exact-substring keep-first trim (suffix ANSV over the SURVIVOR
    * corpus, 8-token threshold) → decontaminate the trimmed text →
    * source cap. Stages 1–2 (the dedup chain and the survivor-corpus
    * suffix construction) SERVE from the committed survivor-trim
    * store ([[survTrimStoreDir]]); the splice, decontamination, and
    * cap run per execution — output-linear keyed work, bit-identical
    * to the former inline build. Shared by the row and by the oracle
    * generation (temperature quotas over this pool are trained
    * literals).
    */
  private def capstonePoolExact(s: SparkSession, dir: String): DataFrame = {
    val (idx, surv) = graft.operators.Suffix.loadSurvTrimSnapshot(
      s, survTrimStoreDir(s, dir),
      expectParams = Some(survTrimParamsFp))
    // pinned: the trimmed pool feeds the decontamination grams, the
    // dirty anti-join, AND the final pool — without the pin the splice
    // (spans → covered positions → ordered rebuild) re-executes per
    // reference
    val trimmed = graft.operators.Suffix
      .trimDupSpansKeepFirstText(idx, surv, "doc_id", "text", minLen = 8L)
      .filter(col("kept_tokens") > 0)
      .join(surv.select(col("doc_id"), col("lang"), col("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("clean_text").as("text"), col("kept_tokens").as("n_tokens"))
      .localCheckpoint()
    val evalSlice = t(s, dir, "documents")
      .filter(col("doc_id") % 100 === 3)
    val trainPool = trimmed.filter(col("doc_id") % 100 =!= 3)
    val dirty = Dedup.contaminationPairs(trainPool, evalSlice,
        "doc_id", "text", n = 4)
      .select(col("doc_id")).distinct()
    val clean = trainPool.join(dirty, Seq("doc_id"), "left_anti")
    graft.operators.Curation.sourceQuota(clean, "source", "doc_id",
      col("n_tokens"), cap = 50)
  }

  /** Stages 1–4 of the q244 curation capstone (dedup keep-best →
    * decontaminate → source cap) — shared by the row and by the
    * oracle generation, which must compute the temperature quotas
    * over exactly this pool (quotas are trained literals, like
    * centroids and merge tables).
    */
  private def capstonePool(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(col("text")).cast("long"))
    val cache = new Dedup.CacheHandle()
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
        cache = cache)
      .select(col("id_a"), col("id_b"))
    val surv = Dedup.dedupByComponentsBest(docs, "doc_id", pairs,
      col("n_tokens"), upstream = cache)
    val evalSlice = docs.filter(col("doc_id") % 100 === 3)
    val trainPool = surv.filter(col("doc_id") % 100 =!= 3)
    val dirty = Dedup.contaminationPairs(trainPool, evalSlice,
        "doc_id", "text", n = 4)
      .select(col("doc_id")).distinct()
    val clean = trainPool.join(dirty, Seq("doc_id"), "left_anti")
    graft.operators.Curation.sourceQuota(clean, "source", "doc_id",
      col("n_tokens"), cap = 50)
  }

  /** Oracle SQL that must be GENERATED against the data (embedding dim,
    * trained IVF centroids) — merged with [[oracleSql]] by [[Verify]].
    * Generation is deterministic: integer k-means + seeded planes, so the
    * driver's oracle run replays exactly what the Spark queries computed.
    */
  /** Doubling/ANSV depths for the suffix oracle mirrors, DERIVED from
    * the corpus at oracle-generation time (ADVICE r13): the unrolled
    * CTEs are sound only while 2^k exceeds the longest document's
    * token count + 1 (the sentinel bounds every comparison) and 2^kn
    * covers the global slot count the ANSV descends walk. Hardcoded
    * depths would silently under-resolve the ORACLE at a larger scale
    * factor or on longer documents while the engine stays exact — a
    * spurious mismatch indistinguishable from an engine bug. Floors
    * keep the small-sf SQL at the shape every prior round shipped
    * (k=10, kn=20).
    */
  private def suffixOracleDepths(spark: SparkSession, dir: String): (Int, Int) = {
    val toks = size(TextAnalysis.tokens(col("text"))).cast("long")
    val r = t(spark, dir, "documents")
      .agg(max(toks), (sum(toks) + count(lit(1))).cast("long")).head()
    val maxTok = r.getLong(0)
    val slots = r.getLong(1)
    def depth(need: Long, floor: Int): Int = {
      var k = floor
      while ((1L << k) <= need) k += 1
      k
    }
    (depth(maxTok + 1, 10), depth(slots - 1, 20))
  }

  def oracleSqlDynamic(spark: SparkSession, dir: String): Map[String, String] = {
    // suffix-mirror depths derived ONCE per dump, shared by every
    // suffix oracle below (q246/q250/q251/q253/q254/q255/q257)
    val (sfxK, sfxKn) = suffixOracleDepths(spark, dir)
    Map(
    // the merge table re-learned by the algorithmically independent
    // RECOUNT trainer (full recount per round, whole-vocab batch
    // passes — none of the indexed loop's incremental state), emitted
    // as literals: rank-for-rank agreement on all 32,768 rows is the
    // delta ≡ recount law proven at full scale
    "q243_bpe_32k_merges" -> {
      val synth = spark.range(0, 32768).select(
        substring(md5(concat(lit("bpe:"), col("id").cast("string"))),
          1, 12).as("w"))
      val (merges, _) = graft.operators.Bpe.trainDriverRecount(
        graft.operators.Bpe.collectVocab(
          graft.operators.Bpe.initialVocab(synth, "w")),
        nMerges = 32768, batchSize = 512, minCount = 1L, overfetch = 16)
      val values = merges.map(m => s"(${m.rank},'${m.a}','${m.b}')")
        .mkString(",\n")
      s"""SELECT CAST(merge_rank AS BIGINT) AS merge_rank, a, b
         |FROM (VALUES
         |$values) AS t(merge_rank, a, b)""".stripMargin
    },
    // the WHOLE curation chain replayed: q105's recursive components +
    // keep-best, q237's 4-gram contamination restricted to survivors,
    // q114's source cap, q169's temperature draw under quotas computed
    // over exactly the capped pool (trained literals — generated by
    // replaying stages 1–4), q235's window-cumsum packing over the
    // mixed set, q115's hash shuffle over the chunks
    "q244_curation_capstone" -> {
      val quotas = graft.operators.Curation.temperatureQuotas(
        capstonePool(spark, dir), "lang", alpha = 0.5, budget = 300L)
      val values = quotas.map { case (g, q) => s"('$g', CAST($q AS BIGINT))" }
        .mkString(",\n         ")
      val hTemp = hexToLongSql("md5('temp:' || CAST(doc_id AS VARCHAR))", 1, 15)
      val hShuf = hexToLongSql("md5('shuffle:' || CAST(chunk_id AS VARCHAR))", 1, 15)
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, lang, source, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |mh AS (SELECT id_a, id_b FROM ($minhashOracleSql) mhp),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM d
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(m) AS component FROM r GROUP BY id),
         |rk AS (SELECT d.doc_id,
         |         row_number() OVER (PARTITION BY comp.component
         |           ORDER BY d.n_tokens DESC, d.doc_id ASC) AS rk
         |       FROM d JOIN comp ON d.doc_id = comp.id),
         |surv AS (SELECT doc_id FROM rk WHERE rk = 1),
         |w4 AS (SELECT doc_id, string_split(text, ' ') AS ww FROM documents),
         |g4 AS (SELECT doc_id, unnest(list_distinct(
         |        [ww[i] || ' ' || ww[i+1] || ' ' || ww[i+2] || ' ' ||
         |         ww[i+3]
         |         FOR i IN range(1, greatest(len(ww) - 3, 0) + 1)])) AS g
         |      FROM w4),
         |tr AS (SELECT g4.doc_id, g FROM g4 JOIN surv USING (doc_id)
         |       WHERE g4.doc_id % 100 <> 3),
         |ev AS (SELECT doc_id AS eval_id, g FROM g4 WHERE doc_id % 100 = 3),
         |dirty AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (g)),
         |clean AS (SELECT d.* FROM d JOIN surv USING (doc_id)
         |          WHERE d.doc_id % 100 <> 3
         |            AND d.doc_id NOT IN (SELECT doc_id FROM dirty)),
         |cap AS (SELECT * FROM (
         |          SELECT clean.*, row_number() OVER (PARTITION BY source
         |            ORDER BY n_tokens DESC, doc_id ASC) AS crk
         |          FROM clean) c WHERE crk <= 50),
         |qq(lang, quota) AS (VALUES
         |         $values),
         |hm AS (SELECT cap.*, CAST($hTemp AS BIGINT) % 1000000 AS h
         |       FROM cap),
         |mix AS (SELECT * FROM (
         |          SELECT hm.*, CAST(row_number() OVER (PARTITION BY lang
         |            ORDER BY h ASC, doc_id ASC) AS INT) AS pos FROM hm) m
         |        JOIN qq USING (lang) WHERE pos <= quota),
         |pk0 AS (SELECT doc_id, n_tokens AS n FROM mix WHERE n_tokens > 0),
         |pk1 AS (SELECT doc_id, n,
         |          CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS BIGINT) AS start
         |        FROM pk0),
         |pk AS (SELECT doc_id, n, start,
         |         unnest(generate_series(start // 256, (start + n - 1) // 256))
         |           AS chunk_id
         |       FROM pk1),
         |spans AS (SELECT chunk_id, doc_id,
         |    greatest(0, chunk_id * 256 - start) AS doc_off,
         |    greatest(start, chunk_id * 256) - chunk_id * 256 AS chunk_off,
         |    least(start + n, (chunk_id + 1) * 256)
         |      - greatest(start, chunk_id * 256) AS len
         |  FROM pk),
         |ch AS (SELECT DISTINCT chunk_id FROM spans),
         |sh AS (SELECT chunk_id, CAST($hShuf AS BIGINT) AS hv FROM ch),
         |ord AS (SELECT chunk_id, CAST(hv % 8 AS INT) AS shard,
         |          CAST(row_number() OVER (PARTITION BY hv % 8
         |            ORDER BY hv ASC, chunk_id ASC) AS INT) AS position
         |        FROM sh)
         |SELECT ord.shard, ord.position, spans.chunk_id, spans.doc_id,
         |  spans.doc_off, spans.chunk_off, spans.len
         |FROM spans JOIN ord USING (chunk_id)""".stripMargin
    },
    // CAPSTONE v2: the q244 replay with the exact-substring keep-first
    // trim spliced between dedup and decontamination — the survivor
    // corpus runs the FULL ANSV chain (suffixKeepFirstCtes over a
    // surv-restricted source), the kept token stream rebuilds each
    // trimmed document, and every later stage (4-gram decontamination,
    // source cap, temperature mix, packing, shuffle) reads the TRIMMED
    // text and token counts
    "q255_capstone_exact_trim" -> {
      val quotas = graft.operators.Curation.temperatureQuotas(
        capstonePoolExact(spark, dir), "lang", alpha = 0.5, budget = 300L)
      val values = quotas.map { case (g, q) => s"('$g', CAST($q AS BIGINT))" }
        .mkString(",\n         ")
      val hTemp = hexToLongSql("md5('temp:' || CAST(doc_id AS VARCHAR))", 1, 15)
      val hShuf = hexToLongSql("md5('shuffle:' || CAST(chunk_id AS VARCHAR))", 1, 15)
      val suffixCtes = suffixKeepFirstCtes(minLen = 8, k = sfxK, kn = sfxKn,
        docsRel = "(SELECT d2.doc_id, d2.text FROM documents d2 " +
          "JOIN surv s2 ON s2.doc_id = d2.doc_id) tsrc")
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, lang, source, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |mh AS (SELECT id_a, id_b FROM ($minhashOracleSql) mhp),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM d
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(m) AS component FROM r GROUP BY id),
         |rk AS (SELECT d.doc_id,
         |         row_number() OVER (PARTITION BY comp.component
         |           ORDER BY d.n_tokens DESC, d.doc_id ASC) AS rk
         |       FROM d JOIN comp ON d.doc_id = comp.id),
         |surv AS (SELECT doc_id FROM rk WHERE rk = 1),
         |$suffixCtes,
         |keep AS (SELECT p.doc_id, p.pos, p.key FROM pos p
         |  WHERE p.flag = 1 AND NOT EXISTS (SELECT 1 FROM isl
         |    WHERE isl.doc_id = p.doc_id AND p.pos BETWEEN isl.s AND isl.e)),
         |td AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  string_agg(key, ' ' ORDER BY pos) AS text
         |  FROM keep GROUP BY doc_id),
         |w5 AS (SELECT doc_id, string_split(text, ' ') AS ww FROM td),
         |trg AS (SELECT w5.doc_id, unnest(list_distinct(
         |        [ww[i] || ' ' || ww[i+1] || ' ' || ww[i+2] || ' ' ||
         |         ww[i+3]
         |         FOR i IN range(1, greatest(len(ww) - 3, 0) + 1)])) AS g
         |      FROM w5 WHERE w5.doc_id % 100 <> 3),
         |w4 AS (SELECT doc_id, string_split(text, ' ') AS ww
         |       FROM documents WHERE doc_id % 100 = 3),
         |evg AS (SELECT doc_id AS eval_id, unnest(list_distinct(
         |        [ww[i] || ' ' || ww[i+1] || ' ' || ww[i+2] || ' ' ||
         |         ww[i+3]
         |         FOR i IN range(1, greatest(len(ww) - 3, 0) + 1)])) AS g
         |      FROM w4),
         |dirty AS (SELECT DISTINCT trg.doc_id FROM trg JOIN evg USING (g)),
         |clean AS (SELECT td.doc_id, dd.lang, dd.source, td.n_tokens
         |          FROM td JOIN documents dd USING (doc_id)
         |          WHERE td.doc_id % 100 <> 3
         |            AND td.doc_id NOT IN (SELECT doc_id FROM dirty)),
         |cap AS (SELECT * FROM (
         |          SELECT clean.*, row_number() OVER (PARTITION BY source
         |            ORDER BY n_tokens DESC, doc_id ASC) AS crk
         |          FROM clean) c WHERE crk <= 50),
         |qq(lang, quota) AS (VALUES
         |         $values),
         |hm AS (SELECT cap.*, CAST($hTemp AS BIGINT) % 1000000 AS h
         |       FROM cap),
         |mix AS (SELECT * FROM (
         |          SELECT hm.*, CAST(row_number() OVER (PARTITION BY lang
         |            ORDER BY h ASC, doc_id ASC) AS INT) AS mpos FROM hm) m
         |        JOIN qq USING (lang) WHERE mpos <= quota),
         |pk0 AS (SELECT doc_id, n_tokens AS n FROM mix WHERE n_tokens > 0),
         |pk1 AS (SELECT doc_id, n,
         |          CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS BIGINT) AS start
         |        FROM pk0),
         |pk AS (SELECT doc_id, n, start,
         |         unnest(generate_series(start // 256, (start + n - 1) // 256))
         |           AS chunk_id
         |       FROM pk1),
         |spans AS (SELECT chunk_id, doc_id,
         |    greatest(0, chunk_id * 256 - start) AS doc_off,
         |    greatest(start, chunk_id * 256) - chunk_id * 256 AS chunk_off,
         |    least(start + n, (chunk_id + 1) * 256)
         |      - greatest(start, chunk_id * 256) AS len
         |  FROM pk),
         |ch AS (SELECT DISTINCT chunk_id FROM spans),
         |sh AS (SELECT chunk_id, CAST($hShuf AS BIGINT) AS hv FROM ch),
         |ord AS (SELECT chunk_id, CAST(hv % 8 AS INT) AS shard,
         |          CAST(row_number() OVER (PARTITION BY hv % 8
         |            ORDER BY hv ASC, chunk_id ASC) AS INT) AS position
         |        FROM sh)
         |SELECT ord.shard, ord.position, spans.chunk_id, spans.doc_id,
         |  spans.doc_off, spans.chunk_off, spans.len
         |FROM spans JOIN ord USING (chunk_id)""".stripMargin
    },
    "q191_ridge_residuals" -> ridgeOracleSql(spark, dir),
    "q192_nb_language" -> nbOracleSql(spark, dir),
    // q192's argmax predictions joined back to true labels
    "q227_confusion" ->
      s"""SELECT d.lang, p.pred_label, CAST(count(*) AS BIGINT) AS n
         |FROM (
         |${nbOracleSql(spark, dir)}
         |) p JOIN documents d USING (doc_id)
         |GROUP BY d.lang, p.pred_label""".stripMargin,
    // q116's generator trained on the retrained mixture (seed ∪ the
    // +0.5-shifted copies), the union rendered as the SQL source; the
    // query side stays the ORIGINAL vectors
    "q245_pq_auto_retrain" -> {
      val emb = Tables(spark, dir, "embeddings")
      val base = emb.select(col("vec_id"),
        transform(col("embedding"), x => x + lit(0.0)).as("embedding"))
      val shifted = emb.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(4.0)).as("embedding"))
      SimilarityOracle.ivfPqTopKSql(spark, dir,
        trainDf = Some(base.unionByName(shifted)),
        srcSql = Some(
          "SELECT vec_id, embedding FROM embeddings UNION ALL " +
            "SELECT vec_id + 1000000, " +
            "list_transform(embedding, x -> x * 4.0) FROM embeddings"),
        queryWhere = "vec_id % 25 = 0 AND vec_id < 1000000")
    },
    "q56_ann_lsh_topk" -> SimilarityOracle.lshTopKSql(spark, dir),
    "q57_ann_ivf_topk" -> SimilarityOracle.ivfTopKSql(spark, dir),
    "q106_ivf_index_append" -> SimilarityOracle.ivfTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    // the streaming twin keeps q106's exact train/search split
    "q151_ivf_stream_serve" -> SimilarityOracle.ivfTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    // the committed-store twin keeps q151's exact train/search split
    // (seed trains, drops assign with stored centroids, serve over
    // everything) — the ledger changes WHERE appends live, not what
    // the serve returns; a doubled replay would duplicate candidate
    // rows, which this mirror would catch
    "q248_committed_ivf_ingest" -> SimilarityOracle.ivfTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    // same on the PQ family ≡ q150's mirror
    "q249_committed_pq_ingest" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    "q67_neardup_lsh_banded" -> SimilarityOracle.bandedNearDupSql(spark, dir, threshold = 0.45),
    "q116_ann_ivf_pq_topk" -> SimilarityOracle.ivfPqTopKSql(spark, dir),
    "q223_ann_ivf_sq8_topk" -> SimilarityOracle.ivfSq8TopKSql(spark, dir),
    "q119_pq_index_append" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    // tombstone-deleted serve ≡ a corpus that never held the deleted
    // vectors (same train/search split as q119, survivors only)
    "q159_pq_delete_serve" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0"),
      corpusWhere = Some("vec_id % 7 <> 3")),
    // snapshot serve ≡ a corpus that never saw the torn batch (same
    // train split; committed set = seed ∪ the one committed append)
    "q165_pq_snapshot_serve" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0"),
      corpusWhere = Some("vec_id % 20 <> 10")),
    // the streaming twin keeps q119's exact train/search split, so the
    // mirror is identical (quantizers from the seed, search everything)
    "q150_pq_stream_serve" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      trainWhere = Some("vec_id % 10 <> 0")),
    "q121_pq_refined_topk" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      refineShortlist = Some(50)),
    "q129_pq_filtered_topk" -> SimilarityOracle.ivfPqTopKSql(spark, dir,
      corpusWhere = Some("vec_id % 2 = 0")),
    // the zone-map ranged serve ≡ filtered search over the top-quarter
    // id range (quantizers trained on the base batch alone — the
    // committed-store append contract; zone maps only change which
    // FILES are read, never which rows qualify)
    "q247_pq_zonemap_range_serve" -> {
      val mx = Tables(spark, dir, "embeddings")
        .agg(max(col("vec_id"))).head().getLong(0)
      SimilarityOracle.ivfPqTopKSql(spark, dir,
        trainWhere = Some(s"vec_id <= ${mx / 2}"),
        corpusWhere = Some(s"vec_id > ${(mx * 3) / 4}"))
    },
    "q133_media_neardup" -> SimilarityOracle.mediaNearDupSql(threshold = 0.999,
      nPlanes = 10, nTables = 2),
    "q153_semdedup" -> SimilarityOracle.semDedupSql(spark, dir, threshold = 0.35),
    "q168_pca_project" -> SimilarityOracle.pcaProjectSql(spark, dir, r = 8),
    // the streaming twin's seed ∪ drops = the full table and moments
    // merge by exact integer sum ⇒ identical fitted basis, same mirror
    "q176_pca_stream_fit" -> SimilarityOracle.pcaProjectSql(spark, dir, r = 8),
    "q154_diverse_sample" -> SimilarityOracle.diverseSampleSql(spark, dir, quota = 10),
    "q156_dsir_weights" -> dsirOracleSql(spark, dir),
    "q169_temperature_mix" -> temperatureOracleSql(spark, dir),
    "q174_doremi_weights" -> doremiOracleSql(spark, dir),
    "q178_hybrid_rrf" -> hybridRrfOracleSql(spark, dir),
    // the stack = the hybrid-fused run (stored-index text serve ≡ the
    // same bm25 mirror, q139's proven equivalence) feeding the
    // unrolled MMR steps
    "q184_search_stack" -> mmrOracleSqlFor(
      s"""SELECT qid, doc_id, rn FROM (
         |${hybridRrfOracleSql(spark, dir)}
         |) h""".stripMargin),
    "q157_bm25_log_topk" -> bm25LogOracleSql(spark, dir),
    "q134_ann_lsh_multiprobe" -> SimilarityOracle.lshTopKSql(spark, dir,
      multiProbe = true),
    // the streaming bloom gate is LOSSLESS (no false negatives, exact
    // confirm) and admitted fps are arrival-order invariant, so the
    // oracle is the plain set difference
    "q120_bloom_stream_ingest" ->
      """WITH d AS (SELECT doc_id,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |           FROM documents)
        |SELECT DISTINCT fp FROM d
        |WHERE doc_id % 10 = 0
        |  AND NOT EXISTS (SELECT 1 FROM d d2
        |                  WHERE d2.doc_id % 10 <> 0 AND d2.fp = d.fp)""".stripMargin,
    // ensemble = text-Jaccard ∪ banded-embedding signals; the embedding
    // leg mirrors the same plane literals as q67 (a derived table may
    // carry its own WITH clause in DuckDB)
    "q65_dedup_ensemble" -> {
      val embPairs = SimilarityOracle.bandedNearDupSql(spark, dir, threshold = 0.45)
      s"""SELECT id_a, id_b, count(*) AS n_signals,
         |  array_to_string(list_sort(list(DISTINCT signal)), ',') AS signals
         |FROM (
         |  SELECT id_a, id_b, 'text' AS signal FROM (
         |${oracleJaccardPairs(0.5)}) tp
         |  UNION ALL
         |  SELECT id_a, id_b, 'embedding' AS signal FROM ($embPairs) bp
         |) u GROUP BY id_a, id_b""".stripMargin
    },
    "q207_bpe_train" -> bpeOracleSql(spark, dir),
    "q213_bpe_fertility" -> bpeFertilityOracleSql(spark, dir),
    "q236_bpe_encode_ids" -> bpeEncodeOracleSql(spark, dir),
    // the batched table re-learned deterministically, replayed the
    // same way (q207's mirror with trainBatched literals)
    "q231_bpe_train_batched" -> {
      val segK = bpeSegSql(graft.operators.Bpe.trainBatched(
        Tables(spark, dir, "documents"), "text", nMerges = 20,
        batchSize = 5))
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
         |      FROM w WHERE word <> '' GROUP BY word),
         |s AS (SELECT word, freq, $segK AS seg FROM v)
         |SELECT word, freq,
         |  replace(replace(seg, chr(1), '['), chr(2), ']') AS seg_disp,
         |  CAST(length(seg) - length(replace(seg, chr(1), '')) AS BIGINT) AS n_subwords
         |FROM s""".stripMargin
    },
    // the ~1k-merge table re-learned deterministically (same params),
    // replayed in chunked CTE layers over the c_name vocabulary
    "q234_bpe_vocab_scale" -> {
      val (ctes, fin) = bpeChunkedSegCtes(graft.operators.Bpe.trainBatched(
        Tables(spark, dir, "customer"), "c_name", nMerges = 1000,
        batchSize = 64, minCount = 1, overfetch = 16))
      s"""WITH w AS (SELECT unnest(string_split(c_name, ' ')) AS word FROM customer),
         |v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
         |      FROM w WHERE word <> '' GROUP BY word),
         |$ctes
         |SELECT word, freq,
         |  replace(replace(seg, chr(1), '['), chr(2), ']') AS seg_disp,
         |  CAST(length(seg) - length(replace(seg, chr(1), '')) AS BIGINT) AS n_subwords
         |FROM $fin""".stripMargin
    },
    // an algorithmically INDEPENDENT suffix construction: single-window
    // dense ranks + lead() doubling unrolled to the DERIVED depth
    // (2^sfxK > longest doc + sentinel; the Spark side doubles until
    // distinct), unrolled binary-lifting LCP joins. Agreement is
    // guaranteed because dup_len depends only on rank EQUALITY classes
    // and the max-LCP neighbor is adjacent in ANY lexicographic order —
    // engine collation and doubling depth cancel out of the output.
    "q246_suffix_dup_spans" ->
      suffixDupSpansOracleSql(minLen = 8, k = sfxK),
    // global spans filtered to the top-quarter doc_id bound (the serve
    // side proves duplens file skipping; dup_len stays corpus-global)
    "q257_suffix_ranged_audit" ->
      s"""WITH ${suffixSpanCtes(8, sfxK)},
         |bnd AS (SELECT (max(doc_id) * 3) // 4 + 1 AS lo FROM documents)
         |SELECT doc_id, span_start, span_end, span_tokens, n_pos
         |FROM spans, bnd WHERE spans.doc_id >= bnd.lo""".stripMargin,
    // the span CTEs rolled up per document (COALESCE-0 for untouched
    // docs, q212's shape)
    "q250_suffix_trim" -> suffixTrimOracleSql(minLen = 8, k = sfxK),
    // the span CTEs joined back to the token arrays; both engines cut
    // the SAME 1-based inclusive slice and space-join it
    "q251_boilerplate_report" ->
      suffixReportOracleSql(minLen = 8, k = sfxK, topK = 20),
    // the independent recursive-CTE ANSV: same rank core, sparse
    // min-tables by lead() doubling, two recursive descends — engine
    // agreement is construction-independent (prev_len is a property
    // of gpos order + rank equality classes alone)
    "q253_suffix_keep_first" ->
      suffixKeepFirstOracleSql(minLen = 8, k = sfxK, kn = sfxKn),
    // the splice-back: same ANSV chain, kept tokens re-joined in order
    "q254_suffix_clean_text" ->
      suffixCleanTextOracleSql(minLen = 8, k = sfxK, kn = sfxKn),
    // after the policy-fired rebuild the index covers the FULL corpus
    // (seed ∪ append) — the q246 global-span mirror applies verbatim
    "q259_suffix_rebuild_policy" ->
      suffixDupSpansOracleSql(minLen = 8, k = sfxK),
    // the distilled quality filter: the generator REFITS the ridge
    // through the same deterministic moment pass + driver solve the
    // engine ran (identical integer moments → identical pivots →
    // identical micro literals, the ridgeOracleSql contract) and
    // replays the hashed features + literal dot product in SQL
    "q262_quality_distill" -> qualityDistillOracleSql(spark, dir),
    // the proxy's eval: same refit literals, q222's exact
    // Mann-Whitney AUC over the held-out scores vs the teacher's
    // ≥ 0.5 verdict, per source
    "q263_distill_auc" -> distillAucOracleSql(spark, dir),
    // the gated-ingest serve ranks over ONLY the decontaminated
    // corpus: seed (clean by layout) ∪ drop vectors NOT within
    // cosine 0.30 of the eval slice — the NOT-IN subquery replays
    // the gate over the same quantized vectors; centroids train on
    // the seed exactly as the engine's committed build did
    "q264_semantic_gated_ingest" -> SimilarityOracle.ivfTopKSql(
      spark, dir,
      trainWhere = Some("vec_id % 10 <> 0 AND vec_id % 25 <> 0"),
      corpusWhere = Some(
        """vec_id % 25 <> 0 AND (vec_id % 10 <> 0 OR vec_id NOT IN (
          |      SELECT co.vec_id FROM e co, e ev
          |      WHERE ev.vec_id % 25 = 0 AND co.vec_id % 25 <> 0
          |        AND list_dot_product(co.vm, ev.vm) /
          |          (sqrt(list_dot_product(co.vm, co.vm)) *
          |           sqrt(list_dot_product(ev.vm, ev.vm))) >= 0.3))"""
          .stripMargin)))
  }

  /** Shared CTE block for the q262/q263 mirrors: refit the distilled
    * quality ridge (deterministic — same exact-integer moments, same
    * fixed-pivot elimination ⇒ identical micro literals), render
    * DuckDB-side hashed features for the HELD-OUT split, and score
    * them with the literal dot product as `s(doc_id, n_tokens,
    * y_micro, pred_micro)`.
    */
  private def distillScoredCtes(spark: SparkSession,
      dir: String): String = {
    val xCols = Seq("n_tokens") ++ (0 until 8).map(j => s"f$j")
    val fit = graft.operators.Regression.fitRidge(
      graft.operators.Classify.distillQualityFeatures(
        Tables(spark, dir, "documents"), "doc_id", "text", nBuckets = 8)
        .filter(col("doc_id") % 10 =!= 0),
      "y_micro", xCols, lambda = 1e4)
    val h = hexToLongSql("md5('qf:' || tok)", 1, 15)
    val fSel = (0 until 8).map(j =>
      s"CAST(count(*) FILTER (WHERE bucket = $j) AS BIGINT) AS f$j")
      .mkString(",\n        ")
    val pred = fit.wMicro.zipWithIndex.map { case (w, i) =>
      if (i == 0) s"($w)" else s"($w) * ${xCols(i - 1)}"
    }.mkString(" + ")
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |            FROM documents WHERE doc_id % 10 = 0),
       |b AS (SELECT doc_id, tok, CAST($h AS BIGINT) % 8 AS bucket
       |      FROM tok),
       |f AS (SELECT doc_id,
       |        CAST(count(*) AS BIGINT) AS n_tokens,
       |        CAST((count(DISTINCT tok) * 1000000) // count(*) AS BIGINT)
       |          AS y_micro,
       |        $fSel
       |      FROM b GROUP BY doc_id),
       |s AS (SELECT doc_id, n_tokens, y_micro,
       |        CAST($pred AS BIGINT) AS pred_micro
       |      FROM f)""".stripMargin
  }

  /** q262's mirror: the shared scored CTEs + the gate at predicted
    * ratio ≥ 0.5.
    */
  private def qualityDistillOracleSql(spark: SparkSession,
      dir: String): String =
    s"""WITH ${distillScoredCtes(spark, dir)}
       |SELECT doc_id, n_tokens, y_micro, pred_micro,
       |  CAST(CASE WHEN pred_micro >= 500000000000 THEN 1 ELSE 0 END
       |    AS INT) AS kept
       |FROM s""".stripMargin

  /** q263's mirror: the shared scored CTEs + q222's exact-integer
    * Mann-Whitney AUC arithmetic over (proxy score, teacher verdict)
    * per source.
    */
  private def distillAucOracleSql(spark: SparkSession,
      dir: String): String =
    s"""WITH ${distillScoredCtes(spark, dir)},
       |d AS (SELECT doc.source, s.pred_micro AS score,
       |        CAST(CASE WHEN s.y_micro >= 500000 THEN 1 ELSE 0 END
       |          AS BIGINT) AS label
       |      FROM s JOIN documents doc ON doc.doc_id = s.doc_id),
       |g AS (SELECT source, score, CAST(count(*) AS BIGINT) AS n_at,
       |        CAST(sum(label) AS BIGINT) AS p_at
       |      FROM d GROUP BY source, score),
       |c AS (SELECT *, n_at - p_at AS neg_at,
       |        CAST(sum(n_at - p_at) OVER (PARTITION BY source
       |          ORDER BY score) AS BIGINT) AS cum_neg
       |      FROM g),
       |a AS (SELECT source, CAST(sum(p_at) AS BIGINT) AS n_pos,
       |        CAST(sum(neg_at) AS BIGINT) AS n_neg,
       |        CAST(sum(p_at * (2*(cum_neg - neg_at) + neg_at)) AS BIGINT)
       |          AS u2
       |      FROM c GROUP BY source)
       |SELECT source, n_pos, n_neg,
       |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0
       |    AND n_pos <= 4611686018427387 // greatest(n_neg, 1) THEN
       |    ((u2 * 1000) // (2 * n_pos * n_neg)) * 1000
       |    + (((u2 * 1000) % (2 * n_pos * n_neg)) * 1000)
       |      // (2 * n_pos * n_neg)
       |  END AS BIGINT) AS auc_micro
       |FROM a""".stripMargin

  /** The nested-replace replay of a TRAINED merge table: DuckDB's
    * replace shares Spark's left-to-right non-overlapping scan and
    * chr(1)/chr(2) are the same wrappers, so folding the k merges (in
    * rank order, innermost first) over the initial character
    * segmentation reproduces the learned segmentation bit-for-bit.
    */
  private def bpeSegSql(merges: Seq[graft.operators.Bpe.Merge]): String = {
    def sym(x: String) = "chr(1)||'" + x.replace("'", "''") + "'||chr(2)"
    val seg0 = """regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g')"""
    merges.sortBy(_.rank).foldLeft(seg0) { (acc, m) =>
      s"replace($acc,\n      ${sym(m.a)}||${sym(m.b)}, ${sym(m.a + m.b)})"
    }
  }

  /** [[bpeSegSql]] for merge tables too deep to nest in one expression
    * (DuckDB's max_expression_depth is 1000): the replay is broken into
    * CTE layers of `chunk` nested replaces each — `s0` is the initial
    * character segmentation of the vocab relation `v`, `s{i}` applies
    * the next `chunk` merges to `s{i-1}`. Returns (cteFragment,
    * finalCteName); sequential layers over a fold ≡ one deep fold.
    */
  private def bpeChunkedSegCtes(merges: Seq[graft.operators.Bpe.Merge],
      chunk: Int = 50): (String, String) = {
    def sym(x: String) = "chr(1)||'" + x.replace("'", "''") + "'||chr(2)"
    val seg0 = """regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g')"""
    val head = s"s0 AS (SELECT word, freq, $seg0 AS seg FROM v)"
    val groups = merges.sortBy(_.rank).grouped(chunk).toSeq
    val layers = groups.zipWithIndex.map { case (g, i) =>
      val folded = g.foldLeft("seg") { (acc, m) =>
        s"replace($acc, ${sym(m.a)}||${sym(m.b)}, ${sym(m.a + m.b)})"
      }
      s"s${i + 1} AS (SELECT word, freq,\n  $folded AS seg FROM s$i)"
    }
    ((head +: layers).mkString(",\n"), s"s${groups.size}")
  }

  /** Oracle-side retraining, shared by the q207/q213 mirrors: the
    * merge table is RE-LEARNED deterministically
    * ([[graft.operators.Bpe.train]] — exact integer pair counts, the
    * (count desc, a, b) total-order argmax), so the generated SQL
    * replays exactly the literals the Spark queries learned.
    */
  private def bpeOracleMerges(spark: SparkSession,
      dir: String): Seq[graft.operators.Bpe.Merge] =
    graft.operators.Bpe.train(Tables(spark, dir, "documents"), "text",
      nMerges = 20)

  /** Mirror of q207: replay the learned table over the vocabulary. */
  private def bpeOracleSql(spark: SparkSession, dir: String): String = {
    val segK = bpeSegSql(bpeOracleMerges(spark, dir))
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |v AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |      FROM w WHERE word <> '' GROUP BY word),
       |s AS (SELECT word, freq, $segK AS seg FROM v)
       |SELECT word, freq,
       |  replace(replace(seg, chr(1), '['), chr(2), ']') AS seg_disp,
       |  CAST(length(seg) - length(replace(seg, chr(1), '')) AS BIGINT) AS n_subwords
       |FROM s""".stripMargin
  }

  /** Mirror of q236: replay the learned segmentation over the vocab,
    * assign dense ids by subword binary order (row_number ↔ the
    * engine's two-pass allocation), rebuild per-document subword
    * positions from a window cumsum over the word stream, and reduce
    * to the same integer checksums — the order-sensitive Σ(pos+1)·id
    * pins the exact id sequence.
    */
  private def bpeEncodeOracleSql(spark: SparkSession, dir: String): String = {
    val segK = bpeSegSql(bpeOracleMerges(spark, dir))
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |v AS (SELECT word FROM w WHERE word <> '' GROUP BY word),
       |sv AS (SELECT word,
       |         string_split(trim(seg, chr(1) || chr(2)), chr(2) || chr(1))
       |           AS subs
       |       FROM (SELECT word, $segK AS seg FROM v) sx),
       |vid AS (SELECT subword,
       |          CAST(row_number() OVER (ORDER BY subword) - 1 AS BIGINT) AS tid
       |        FROM (SELECT DISTINCT unnest(subs) AS subword FROM sv) dv),
       |tok AS (SELECT doc_id, s.wpos AS wpos, s.word AS word FROM
       |  (SELECT doc_id, unnest([{'wpos': i, 'word': ww[i]}
       |                          FOR i IN range(1, len(ww) + 1)]) AS s
       |   FROM (SELECT doc_id, string_split(text, ' ') AS ww
       |         FROM documents) t0) t1
       |  WHERE s.word <> ''),
       |two AS (SELECT tok.doc_id, tok.wpos, sv.subs,
       |          CAST(coalesce(sum(len(sv.subs)) OVER (PARTITION BY tok.doc_id
       |            ORDER BY tok.wpos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |            AS BIGINT) AS off
       |        FROM tok JOIN sv USING (word)),
       |ids AS (SELECT t.doc_id, t.off + t.s.j - 1 AS pos, vid.tid FROM
       |  (SELECT doc_id, off, unnest([{'j': j, 'sub': subs[j]}
       |                               FOR j IN range(1, len(subs) + 1)]) AS s
       |   FROM two) t JOIN vid ON vid.subword = t.s.sub)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ids,
       |  CAST(sum(tid) AS BIGINT) AS sum_ids,
       |  CAST(sum((pos + 1) * tid) AS BIGINT) AS possum_ids
       |FROM ids GROUP BY doc_id""".stripMargin
  }

  /** Mirror of q213: the same replay, but segmentation stays
    * vocabulary-sized and the corpus token stream JOINS it — per-doc
    * word/subword sums roll up per language with an integer-micro
    * fertility ratio (both engines truncate `div`).
    */
  private def bpeFertilityOracleSql(spark: SparkSession, dir: String): String = {
    val segK = bpeSegSql(bpeOracleMerges(spark, dir))
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |           FROM documents),
       |v AS (SELECT word FROM w WHERE word <> '' GROUP BY word),
       |sv AS (SELECT word,
       |         CAST(length(seg) - length(replace(seg, chr(1), '')) AS BIGINT)
       |           AS n_subwords
       |       FROM (SELECT word, $segK AS seg FROM v) x),
       |d AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |        CAST(sum(sv.n_subwords) AS BIGINT) AS n_subwords
       |      FROM w JOIN sv USING (word) GROUP BY w.doc_id)
       |SELECT doc.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(d.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(d.n_subwords) AS BIGINT) AS n_subwords,
       |  CAST(sum(d.n_subwords) * 1000000 // sum(d.n_words) AS BIGINT)
       |    AS fertility_micro
       |FROM d JOIN documents doc USING (doc_id) GROUP BY doc.lang""".stripMargin
  }

  /** Mirror of q156: re-derives the SAME driver-computed DSIR bucket
    * weights (deterministic: bounded exact-count collect + StrictMath)
    * and renders them as a VALUES table — the trained-centroid pattern,
    * so neither engine runs its own log. Token hashing replays the
    * md5-mod-buckets feature extraction per-nibble.
    */
  private def dsirOracleSql(spark: SparkSession, dir: String): String = {
    val wts = Curation.dsirBucketWeights(Tables(spark, dir, "documents"),
      "doc_id", "text", isTarget = col("lang") === "en", nBuckets = 1024)
    val values = wts.map { case (b, w) => s"($b, CAST($w AS BIGINT))" }
      .mkString(",\n         ")
    val b = hexToLongSql("md5('dsir:' || wd)", 1, 15)
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
       |             FROM documents),
       |tb AS (SELECT doc_id, ($b) % 1024 AS b FROM tok),
       |wt(b, bits_micro) AS (VALUES
       |         $values)
       |SELECT tb.doc_id, count(*) AS n_feats,
       |  CAST(sum(wt.bits_micro) AS BIGINT) AS sum_bits_micro,
       |  CAST(CAST(sum(wt.bits_micro) AS BIGINT) // count(*) AS BIGINT)
       |    AS mean_bits_micro
       |FROM tb JOIN wt USING (b) GROUP BY tb.doc_id""".stripMargin
  }

  /** Shared phrase-search mirror (q167 in-flight, q170 stored-index
    * serve over the same corpus, q173 via [[phraseRestrictedOracleSql]]):
    * the join-on-token + all-offsets-witnessed plan (1-based positions
    * vs Spark's 0-based cancel in the start-offset grouping key).
    */
  private val phraseOracleSql: String = phraseRestrictedOracleSql("TRUE")

  /** [[phraseOracleSql]] with the CORPUS token stream restricted by a
    * predicate (the tombstone-delete serve: matches come from
    * survivors only); the PHRASE side reads the unrestricted split
    * (`wq`) — a deleted doc may still query, never match.
    */
  /** DuckDB mirror for [[graft.operators.Suffix.maximalDupSpans]]:
    * suffix ranks by `lead()`-based prefix doubling UNROLLED to a fixed
    * `k` rounds (2^k must exceed the longest document's token count +
    * 1 — the sentinel bounds every comparison, so ranks are provably
    * distinct by then), exact LCPs for rank-adjacent pairs by unrolled
    * binary lifting, then the q210 island merge. Single-window
    * dense_rank/lead are fine HERE (the oracle engine is single-node by
    * contract); the Spark side uses the distributed
    * sort-then-zipWithIndex ranks and equi-join neighbor lookups.
    */
  private def suffixDupSpansOracleSql(minLen: Int, k: Int): String =
    s"""WITH ${suffixSpanCtes(minLen, k)}
       |SELECT doc_id, span_start, span_end, span_tokens, n_pos
       |FROM spans""".stripMargin

  /** [[suffixDupSpansOracleSql]]'s per-document trim charge under the
    * remove-all-copies policy (q212's COALESCE-0 shape).
    */
  private def suffixTrimOracleSql(minLen: Int, k: Int): String =
    s"""WITH ${suffixSpanCtes(minLen, k)}
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(s.tt, 0) AS trimmed_tokens,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) - COALESCE(s.tt, 0)
       |    AS kept_tokens
       |FROM documents d LEFT JOIN
       |  (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS tt
       |   FROM spans GROUP BY doc_id) s USING (doc_id)""".stripMargin

  /** [[suffixDupSpansOracleSql]]'s top-`topK` longest spans with their
    * extracted text, under the same deterministic total order as the
    * Spark plan.
    */
  private def suffixReportOracleSql(minLen: Int, k: Int, topK: Int): String =
    s"""WITH ${suffixSpanCtes(minLen, k)}
       |SELECT spans.doc_id, span_start, span_end, span_tokens,
       |  array_to_string(list_slice(t.w, CAST(span_start AS INT),
       |    CAST(span_end AS INT)), ' ') AS span_text
       |FROM spans JOIN t ON t.doc_id = spans.doc_id
       |ORDER BY span_tokens DESC, spans.doc_id, span_start
       |LIMIT $topK""".stripMargin

  /** The shared suffix-construction prefix: tokenization, the global
    * slot layout with per-doc sentinels, and `k` unrolled doubling
    * rounds of dense ranks (r0..r`k`). No WITH keyword — callers embed.
    */
  private def suffixRankCtes(k: Int,
      docsRel: String = "documents"): String = {
    val doubling = (1 to k).map { i =>
      val s = 1L << (i - 1)
      s"""r$i AS (SELECT gpos, dense_rank() OVER (ORDER BY r, r2) AS r FROM
         |  (SELECT gpos, r, COALESCE(lead(r, $s) OVER (ORDER BY gpos), -1) AS r2
         |   FROM r${i - 1}))""".stripMargin
    }
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM $docsRel),
       |base AS (SELECT doc_id, len(w) AS n,
       |  COALESCE(sum(len(w) + 1) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt FROM t),
       |pos AS (
       |  SELECT x.doc_id, x.s.pos AS pos, x.strt + x.s.pos - 1 AS gpos,
       |         1 AS flag, x.s.key AS key
       |  FROM (SELECT t.doc_id, strt,
       |          unnest([{'pos': i, 'key': w[i]} FOR i IN range(1, len(w) + 1)]) AS s
       |        FROM t JOIN base USING (doc_id)) x
       |  UNION ALL
       |  SELECT doc_id, n + 1 AS pos, strt + n AS gpos, 0 AS flag,
       |         CAST(doc_id AS VARCHAR) AS key FROM base),
       |r0 AS (SELECT gpos, dense_rank() OVER (ORDER BY flag, key) AS r FROM pos),
       |${doubling.mkString(",\n")}""".stripMargin
  }

  private def suffixSpanCtes(minLen: Int, k: Int): String = {
    val lifting = (k - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == k - 1) "l" else s"l${i + 1}"
      s"""l$i AS (SELECT p, q,
         |  lcp + CASE WHEN rp.r = rq.r THEN $s ELSE 0 END AS lcp
         |  FROM $prev LEFT JOIN r$i rp ON rp.gpos = $prev.p + $prev.lcp
         |             LEFT JOIN r$i rq ON rq.gpos = $prev.q + $prev.lcp)""".stripMargin
    }
    s"""${suffixRankCtes(k)},
       |sa AS (SELECT gpos, row_number() OVER (ORDER BY r) AS sr FROM r$k),
       |l AS (SELECT a.gpos AS p, b.gpos AS q, CAST(0 AS BIGINT) AS lcp
       |  FROM sa a JOIN sa b ON b.sr = a.sr + 1),
       |${lifting.mkString(",\n")},
       |dl AS (SELECT gpos, max(lcp) AS dup_len FROM
       |  (SELECT p AS gpos, lcp FROM l0 UNION ALL SELECT q, lcp FROM l0)
       |  GROUP BY gpos),
       |h AS (SELECT pos.doc_id, pos.pos, pos.pos + dl.dup_len - 1 AS e
       |  FROM dl JOIN pos USING (gpos)
       |  WHERE dl.dup_len >= $minLen AND pos.flag = 1),
       |i1 AS (SELECT doc_id, pos, e,
       |  max(e) OVER (PARTITION BY doc_id ORDER BY pos
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM h),
       |i2 AS (SELECT doc_id, pos, e,
       |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS brk
       |  FROM i1),
       |i3 AS (SELECT doc_id, pos, e,
       |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i2),
       |spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(e) AS BIGINT) AS span_end,
       |  CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
       |  CAST(count(*) AS BIGINT) AS n_pos
       |FROM i3 GROUP BY doc_id, island)""".stripMargin
  }

  /** DuckDB mirror for [[graft.operators.Suffix.trimDupSpansKeepFirst]]
    * — an independent single-node ANSV: the same rank/lifting core as
    * [[suffixSpanCtes]] (0-based, rank carried through the lift so
    * L[i] indexes by rank), then `kn` unrolled lead()-built sparse
    * (min-gpos, min-LCP) levels stacked into ONE MATERIALIZED table
    * and TWO RECURSIVE-CTE descends (left/right nearest-smaller-gpos
    * walks, k counting down — each iteration joins the working set to
    * the level-k slice). MATERIALIZED matters: DuckDB inlines CTEs by
    * default, and the recursive term would otherwise recompute the
    * whole sparse stack every iteration. Agreement with the Spark side
    * is construction-independent — prev_len is a property of
    * (gpos order, rank equality classes) alone.
    */
  private def suffixKeepFirstCtes(minLen: Int, k: Int, kn: Int,
      docsRel: String = "documents"): String = {
    val maxv = Long.MaxValue
    val lifting = (k - 1 to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == k - 1) "l" else s"l${i + 1}"
      s"""l$i AS (SELECT p, q, i,
         |  lcp + CASE WHEN rp.r = rq.r THEN $s ELSE 0 END AS lcp
         |  FROM $prev LEFT JOIN r$i rp ON rp.gpos = $prev.p + $prev.lcp
         |             LEFT JOIN r$i rq ON rq.gpos = $prev.q + $prev.lcp)""".stripMargin
    }
    val sparse = (1 to kn).map { i =>
      val s = 1L << (i - 1)
      s"""sp$i AS (SELECT r,
         |  least(mg, COALESCE(lead(mg, $s) OVER (ORDER BY r), $maxv)) AS mg,
         |  least(ml, COALESCE(lead(ml, $s) OVER (ORDER BY r), $maxv)) AS ml
         |  FROM sp${i - 1})""".stripMargin
    }
    val spUnion = (0 to kn)
      .map(i => s"SELECT $i AS k, r, mg, ml FROM sp$i")
      .mkString("\nUNION ALL ")
    s"""${suffixRankCtes(k, docsRel)},
       |sa AS (SELECT gpos, row_number() OVER (ORDER BY r) - 1 AS i FROM r$k),
       |l AS (SELECT a.gpos AS p, b.gpos AS q, a.i AS i, CAST(0 AS BIGINT) AS lcp
       |  FROM sa a JOIN sa b ON b.i = a.i + 1),
       |${lifting.mkString(",\n")},
       |st AS MATERIALIZED (SELECT sa.i, sa.gpos AS g, ll.lcp AS lnext
       |  FROM sa LEFT JOIN (SELECT i, lcp FROM l0) ll USING (i)),
       |nn AS (SELECT count(*) AS n FROM pos),
       |sp0 AS (SELECT i AS r, g AS mg, COALESCE(lnext, $maxv) AS ml FROM st),
       |${sparse.mkString(",\n")},
       |sp AS MATERIALIZED ($spUnion),
       |wl AS (
       |  SELECT i, g, CAST($kn AS INT) AS k, i AS c,
       |         CAST($maxv AS BIGINT) AS acc FROM st
       |  UNION ALL
       |  SELECT w.i, w.g, w.k - 1,
       |    CASE WHEN s.mg >= w.g THEN w.c - (CAST(1 AS BIGINT) << w.k)
       |         ELSE w.c END,
       |    CASE WHEN s.mg >= w.g THEN least(w.acc, s.ml) ELSE w.acc END
       |  FROM wl w LEFT JOIN sp s
       |    ON s.k = w.k AND s.r = w.c - (CAST(1 AS BIGINT) << w.k)
       |  WHERE w.k >= 0),
       |lres AS (SELECT w.i,
       |  CASE WHEN w.c = 0 THEN 0
       |       ELSE least(w.acc, COALESCE(s2.lnext, $maxv)) END AS llen
       |  FROM (SELECT * FROM wl WHERE k = -1) w
       |  LEFT JOIN st s2 ON s2.i = w.c - 1),
       |wr AS (
       |  SELECT i, g, CAST($kn AS INT) AS k, i AS c,
       |         CAST($maxv AS BIGINT) AS acc FROM st
       |  UNION ALL
       |  SELECT w.i, w.g, w.k - 1,
       |    CASE WHEN smg.mg >= w.g THEN w.c + (CAST(1 AS BIGINT) << w.k)
       |         ELSE w.c END,
       |    CASE WHEN smg.mg >= w.g THEN least(w.acc, sml.ml) ELSE w.acc END
       |  FROM wr w
       |  LEFT JOIN sp smg ON smg.k = w.k AND smg.r = w.c + 1
       |  LEFT JOIN sp sml ON sml.k = w.k AND sml.r = w.c
       |  WHERE w.k >= 0),
       |rres AS (SELECT w.i,
       |  CASE WHEN w.c >= n.n - 1 THEN 0
       |       ELSE least(w.acc, COALESCE(s2.lnext, $maxv)) END AS rlen
       |  FROM (SELECT * FROM wr WHERE k = -1) w CROSS JOIN nn n
       |  LEFT JOIN st s2 ON s2.i = w.c),
       |pv AS (SELECT l2.i, greatest(l2.llen, r2.rlen) AS prev_len
       |  FROM lres l2 JOIN rres r2 USING (i)),
       |h AS (SELECT pos.doc_id, pos.pos, pos.pos + pv.prev_len - 1 AS e
       |  FROM pv JOIN sa ON sa.i = pv.i JOIN pos ON pos.gpos = sa.gpos
       |  WHERE pv.prev_len >= $minLen AND pos.flag = 1),
       |i1 AS (SELECT doc_id, pos, e,
       |  max(e) OVER (PARTITION BY doc_id ORDER BY pos
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM h),
       |i2 AS (SELECT doc_id, pos, e,
       |  CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS brk
       |  FROM i1),
       |i3 AS (SELECT doc_id, pos, e,
       |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM i2),
       |isl AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS s,
       |  CAST(max(e) AS BIGINT) AS e FROM i3 GROUP BY doc_id, island)""".stripMargin
  }

  /** DuckDB mirror for [[graft.operators.Suffix.trimDupSpansKeepFirst]]
    * — the [[suffixKeepFirstCtes]] ANSV chain with the per-document
    * token charge on top.
    */
  private def suffixKeepFirstOracleSql(minLen: Int, k: Int, kn: Int): String =
    s"""WITH RECURSIVE ${suffixKeepFirstCtes(minLen, k, kn)}
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(tr.tt, 0) AS trimmed_tokens,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) - COALESCE(tr.tt, 0)
       |    AS kept_tokens
       |FROM documents d LEFT JOIN
       |  (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS tt
       |   FROM isl GROUP BY doc_id) tr USING (doc_id)""".stripMargin

  /** DuckDB mirror for the keep-first SPLICE-BACK
    * ([[graft.operators.Suffix.trimDupSpansKeepFirstText]], q254): the
    * same ANSV chain, then the kept token stream (positions outside
    * every merged span) re-joined in order per document.
    */
  private def suffixCleanTextOracleSql(minLen: Int, k: Int,
      kn: Int): String =
    s"""WITH RECURSIVE ${suffixKeepFirstCtes(minLen, k, kn)},
       |keep AS (SELECT p.doc_id, p.pos, p.key FROM pos p
       |  WHERE p.flag = 1 AND NOT EXISTS (SELECT 1 FROM isl
       |    WHERE isl.doc_id = p.doc_id AND p.pos BETWEEN isl.s AND isl.e)),
       |tr2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |  string_agg(key, ' ' ORDER BY pos) AS ct FROM keep GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(tr2.n_kept, 0) AS kept_tokens,
       |  COALESCE(tr2.ct, '') AS clean_text
       |FROM documents d LEFT JOIN tr2 USING (doc_id)""".stripMargin

  private def phraseRestrictedOracleSql(corpusWhere: String): String =
    s"""WITH wq AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |w AS (SELECT * FROM wq WHERE $corpusWhere),
      |tok AS (SELECT doc_id, s.pos AS pos, s.tok AS token FROM
      |  (SELECT doc_id, unnest([{'pos': i, 'tok': w.w[i]}
      |                          FOR i IN range(1, len(w.w)+1)]) AS s
      |   FROM w) t),
      |q AS (SELECT doc_id AS pid, list_slice(wq.w, 3, 5) AS qt
      |      FROM wq WHERE doc_id % 2000 = 11 AND len(wq.w) >= 5),
      |qtok AS (SELECT pid, s.off AS off, s.tok AS token FROM
      |  (SELECT pid, unnest([{'off': i, 'tok': qt[i]}
      |                       FOR i IN range(1, len(qt)+1)]) AS s
      |   FROM q) t),
      |plen AS (SELECT pid, len(qt) AS plen FROM q),
      |m AS (SELECT qtok.pid, tok.doc_id, tok.pos - qtok.off AS start,
      |        count(*) AS c
      |      FROM tok JOIN qtok USING (token) GROUP BY 1, 2, 3)
      |SELECT m.pid, m.doc_id, CAST(count(*) AS BIGINT) AS n_matches
      |FROM m JOIN plen ON plen.pid = m.pid WHERE m.c = plen.plen
      |GROUP BY m.pid, m.doc_id""".stripMargin

  /** Mirror of q169: temperature quotas re-derived via
    * [[Curation.temperatureQuotas]] (deterministic driver StrictMath,
    * so the mirror consumes the EXACT literals the Spark query joined
    * in as a VALUES table), then the same md5-order per-group ranking.
    */
  private def temperatureOracleSql(spark: SparkSession, dir: String): String = {
    val quotas = Curation.temperatureQuotas(Tables(spark, dir, "documents"),
      "lang", alpha = 0.5, budget = 300L)
    val values = quotas.map { case (g, q) => s"('$g', CAST($q AS BIGINT))" }
      .mkString(",\n         ")
    val h = hexToLongSql("md5('temp:' || CAST(doc_id AS VARCHAR))", 1, 15)
    s"""WITH d AS (SELECT doc_id, lang, source,
       |             CAST($h AS BIGINT) % 1000000 AS h
       |           FROM documents),
       |r AS (SELECT doc_id, lang, source,
       |        CAST(row_number() OVER (PARTITION BY lang
       |          ORDER BY h ASC, doc_id ASC) AS INT) AS pos
       |      FROM d),
       |qq(lang, quota) AS (VALUES
       |         $values)
       |SELECT doc_id, lang, source, pos
       |FROM r JOIN qq USING (lang) WHERE pos <= quota""".stripMargin
  }

  /** Mirror of q182: the BM25 run replayed as a derived table, then the
    * SAME k greedy MMR steps unrolled as chained CTEs — per step, the
    * max-sim-to-selected join, the λ-weighted score, and the one-row
    * argmax window (mmr desc, doc_id asc), exactly the Spark unroll.
    * Similarity is the identical floor-micro quantized-cosine
    * expression shape (dot·1e6 / (√·√), one rounding per op).
    */
  // lazy: references bm25OracleSql, declared later in this object
  private lazy val mmrOracleSql: String =
    mmrOracleSqlFor(s"""SELECT qid, doc_id, rn FROM (
       |$bm25OracleSql
       |) t""".stripMargin)

  /** The k greedy MMR steps unrolled over an arbitrary
    * (qid, doc_id, rn) run SQL — shared by q182 (BM25 run) and q184
    * (the hybrid-fused run).
    */
  private def mmrOracleSqlFor(runSql: String): String = {
    val k = 5; val lam = 7
    val steps = (1 to k).map { i =>
      val (scored, selPrev) =
        if (i == 1)
          (s"SELECT qid, doc_id, CAST($lam * rel AS BIGINT) AS mmr_micro FROM cand",
            "")
        else {
          val prev = s"sel${i - 1}"
          (s"""SELECT r.qid, r.doc_id,
              |    CAST($lam * r.rel - ${10 - lam} * coalesce(ms.max_sim, 0)
              |      AS BIGINT) AS mmr_micro
              |  FROM (SELECT cand.* FROM cand
              |        WHERE NOT EXISTS (SELECT 1 FROM $prev p
              |          WHERE p.qid = cand.qid AND p.doc_id = cand.doc_id)) r
              |  LEFT JOIN (SELECT sims.qid, sims.a AS doc_id,
              |               max(sims.s) AS max_sim
              |             FROM sims JOIN $prev p
              |               ON p.qid = sims.qid AND p.doc_id = sims.b
              |             GROUP BY sims.qid, sims.a) ms
              |    ON ms.qid = r.qid AND ms.doc_id = r.doc_id""".stripMargin,
            s"SELECT qid, doc_id, pick, mmr_micro FROM sel${i - 1} UNION ALL ")
        }
      s"""p$i AS (SELECT qid, doc_id, $i AS pick, mmr_micro FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY mmr_micro DESC, doc_id ASC) AS prn FROM (
         |$scored
         |) s) t WHERE prn = 1),
         |sel$i AS ($selPrev
         |SELECT qid, doc_id, pick, mmr_micro FROM p$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH run AS (
       |$runSql),
       |e AS (SELECT vec_id AS doc_id,
       |        list_transform(embedding,
       |          x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vm
       |      FROM embeddings),
       |cand AS (SELECT run.qid, run.doc_id,
       |           CAST(1000000 - (run.rn - 1) * 100000 AS BIGINT) AS rel,
       |           e.vm
       |         FROM run JOIN e USING (doc_id)),
       |sims AS (SELECT c1.qid, c1.doc_id AS a, c2.doc_id AS b,
       |    CAST(floor(list_dot_product(c1.vm, c2.vm) * 1000000.0 /
       |      (sqrt(list_dot_product(c1.vm, c1.vm)) *
       |       sqrt(list_dot_product(c2.vm, c2.vm)))) AS BIGINT) AS s
       |  FROM cand c1 JOIN cand c2
       |    ON c1.qid = c2.qid AND c1.doc_id <> c2.doc_id),
       |$steps
       |SELECT qid, doc_id, CAST(pick AS INT) AS pick, mmr_micro
       |FROM sel$k""".stripMargin
  }

  /** Mirror of q178: both runs replayed as derived tables (the text run
    * is [[bm25OracleSql]]; the vector run re-derives the SAME trained
    * centroids via [[SimilarityOracle.ivfTopKSql]] with the hybrid
    * query predicate), then the integer-division RRF fold.
    */
  private def hybridRrfOracleSql(spark: SparkSession, dir: String): String = {
    val ivf = SimilarityOracle.ivfTopKSql(spark, dir,
      queryWhere = "vec_id % 200 = 7")
    s"""WITH fused AS (
       |SELECT qid, doc_id, rn FROM (
       |$bm25OracleSql
       |) t
       |UNION ALL
       |SELECT query_id AS qid, neighbor_id AS doc_id, rank AS rn FROM (
       |$ivf
       |) v
       |),
       |sc AS (SELECT qid, doc_id,
       |         CAST(sum(1000000 // (60 + rn)) AS BIGINT) AS rrf_micro
       |       FROM fused GROUP BY qid, doc_id)
       |SELECT qid, doc_id, rrf_micro, CAST(rn AS INT) AS rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY rrf_micro DESC, doc_id ASC) AS rn FROM sc) r
       |WHERE rn <= 10""".stripMargin
  }

  /** Mirror of q174: per-source surprisal stats re-aggregated from the
    * q146 bigram-LM CTEs, with the driver-computed DoReMi weights
    * (re-derived via [[Curation.doremiWeightLiterals]] over the SAME
    * stats — deterministic) consumed as a VALUES table.
    */
  private def doremiOracleSql(spark: SparkSession, dir: String): String = {
    val stats = Curation.sourceSurprisalStats(
      Tables(spark, dir, "documents"), "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    val values = Curation.doremiWeightLiterals(stats, eta = 1.0)
      .map { case (src, w) => s"('$src', CAST($w AS BIGINT))" }
      .mkString(",\n         ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id,
       |         unnest([w.w[i] || ' ' || w.w[i+1]
       |                 FOR i IN range(1, greatest(len(w.w)-1, 0)+1)]) AS g
       |       FROM w),
       |cb AS (SELECT g, count(*) AS cg FROM bg GROUP BY g),
       |cp AS (SELECT split_part(g, ' ', 1) AS w1,
       |         CAST(sum(cg) AS BIGINT) AS cw FROM cb GROUP BY 1),
       |sc AS (SELECT bg.doc_id,
       |         length(bin(cp.cw)) - length(bin(cb.cg)) AS bits
       |       FROM bg JOIN cb ON cb.g = bg.g
       |         JOIN cp ON cp.w1 = split_part(bg.g, ' ', 1)),
       |per_doc AS (SELECT doc_id, count(*) AS nb,
       |              CAST(sum(bits) AS BIGINT) AS sb
       |            FROM sc GROUP BY doc_id),
       |per_src AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(sum(p.nb) AS BIGINT) AS n_bigrams,
       |              CAST(sum(p.sb) AS BIGINT) AS sum_bits
       |            FROM per_doc p JOIN documents d USING (doc_id)
       |            GROUP BY d.source),
       |wt(source, weight_micro) AS (VALUES
       |         $values)
       |SELECT per_src.*, wt.weight_micro
       |FROM per_src JOIN wt USING (source)""".stripMargin
  }

  /** Mirror of q157: the bm25OracleSql CTE shape with (N, T) as
    * literals and the driver-computed StrictMath idf as a VALUES table
    * (re-derived via [[graft.operators.Retrieval.bm25LogIdf]] —
    * deterministic, so the mirror consumes the EXACT literals the Spark
    * query joined in). Scoring: (idf_micro · (22·tf·T)) / den in
    * DOUBLE, two correctly-rounded IEEE ops then floor — identical to
    * the Spark expression's grouping.
    */
  private def bm25LogOracleSql(spark: SparkSession, dir: String): String = {
    val docs = Tables(spark, dir, "documents")
    val queries = docs.filter(col("doc_id") % 200 === 7)
      .select(col("doc_id").as("qid"),
        array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))
    val (n, t, idf) = graft.operators.Retrieval.bm25LogIdf(
      docs, queries, "doc_id", "text", "qterms")
    val values = idf.map { case (tok, w) =>
      s"('${tok.replace("'", "''")}', CAST($w AS BIGINT))"
    }.mkString(",\n       ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
       |tok AS (SELECT doc_id, unnest(w.w) AS token FROM w),
       |postings AS (SELECT tok.doc_id, dl.dl, tok.token, count(*) AS tf
       |             FROM tok JOIN dl ON dl.doc_id = tok.doc_id
       |             GROUP BY tok.doc_id, dl.dl, tok.token),
       |q AS (SELECT doc_id AS qid, unnest(list_distinct(list_slice(w.w, 1, 4))) AS term
       |      FROM w WHERE doc_id % 200 = 7),
       |idf(token, idf_micro) AS (VALUES
       |       $values),
       |hit AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q)),
       |scored AS (SELECT q.qid, h.doc_id,
       |    CAST(sum(CAST(floor(
       |      CAST(i.idf_micro AS DOUBLE) * CAST(22 * h.tf * $t AS DOUBLE)
       |      / CAST(10 * h.tf * $t + 3 * $t + 9 * h.dl * $n AS DOUBLE))
       |      AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM hit h JOIN q ON q.term = h.token
       |  JOIN idf i ON i.token = h.token
       |  GROUP BY q.qid, h.doc_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
       |             ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored)
       |SELECT qid, doc_id, score_micro, CAST(rn AS INT) AS rn
       |FROM ranked WHERE rn <= 10""".stripMargin
  }

  /** Shared mergeable-aggregate mirror (q143 batch lifecycle, q148
    * streaming twin — both serve the same full-corpus grouped stats).
    */
  private val aggOracleSql: String = aggRestrictedOracleSql("TRUE")

  /** [[aggOracleSql]] with the corpus restricted — q181 serves a
    * retracted-and-repaired store, which must equal the from-scratch
    * aggregate over the survivors.
    */
  private def aggRestrictedOracleSql(where: String): String =
    s"""WITH d AS (SELECT lang, source,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |           FROM documents WHERE $where)
      |SELECT lang, source, count(*) AS cnt,
      |  CAST(sum(tok) AS BIGINT) AS sum_v,
      |  min(tok) AS min_v, max(tok) AS max_v,
      |  CAST((sum(tok) * 1000000) // count(*) AS BIGINT) AS avg_micro
      |FROM d GROUP BY lang, source""".stripMargin

  /** Shared BM25 mirror (q124 in-flight build, q139 stored-index serve
    * over the same corpus): replays the identical BIGINT products,
    * single double division, floor-to-micro, and exact integer sum.
    */
  private val bm25OracleSql: String = bm25OracleSqlK(10)

  /** [[bm25OracleSql]] with a caller-chosen rank cutoff (q218 pools
    * judgments from the top 20 of the same run it evaluates at 10). */
  private def bm25OracleSqlK(k: Int): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS t FROM dl),
      |tok AS (SELECT doc_id, unnest(w.w) AS token FROM w),
      |postings AS (SELECT tok.doc_id, dl.dl, tok.token, count(*) AS tf
      |             FROM tok JOIN dl ON dl.doc_id = tok.doc_id
      |             GROUP BY tok.doc_id, dl.dl, tok.token),
      |q AS (SELECT doc_id AS qid, unnest(list_distinct(list_slice(w.w, 1, 4))) AS term
      |      FROM w WHERE doc_id % 200 = 7),
      |hit AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q)),
      |dfreq AS (SELECT token, count(*) AS df FROM hit GROUP BY token),
      |scored AS (SELECT q.qid, h.doc_id,
      |    CAST(sum(CAST(floor(
      |      CAST((2*s.n - 2*f.df + 1) * 22 * h.tf * s.t AS DOUBLE)
      |      / CAST((2*f.df + 1) * (10*h.tf*s.t + 3*s.t + 9*h.dl*s.n) AS DOUBLE)
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM hit h JOIN q ON q.term = h.token
      |  JOIN dfreq f ON f.token = h.token
      |  CROSS JOIN stats s
      |  GROUP BY q.qid, h.doc_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
      |             ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored)
      |SELECT qid, doc_id, score_micro, CAST(rn AS INT) AS rn
      |FROM ranked WHERE rn <= $k""".stripMargin

  /** [[bm25OracleSql]] with the CORPUS side (w → dl, stats, postings)
    * restricted by a predicate — q158 scores a tombstone-deleted index
    * (≡ a corpus that never held the deleted docs), q163 a snapshot
    * load (≡ a corpus that never saw the torn batch). The QUERY side
    * reads the unrestricted split (`wq`): an excluded doc may still
    * query, never be returned.
    */
  private def bm25RestrictedOracleSql(corpusWhere: String): String =
    s"""WITH wq AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |w AS (SELECT * FROM wq WHERE $corpusWhere),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS t FROM dl),
      |tok AS (SELECT doc_id, unnest(w.w) AS token FROM w),
      |postings AS (SELECT tok.doc_id, dl.dl, tok.token, count(*) AS tf
      |             FROM tok JOIN dl ON dl.doc_id = tok.doc_id
      |             GROUP BY tok.doc_id, dl.dl, tok.token),
      |q AS (SELECT doc_id AS qid, unnest(list_distinct(list_slice(wq.w, 1, 4))) AS term
      |      FROM wq WHERE doc_id % 200 = 7),
      |hit AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q)),
      |dfreq AS (SELECT token, count(*) AS df FROM hit GROUP BY token),
      |scored AS (SELECT q.qid, h.doc_id,
      |    CAST(sum(CAST(floor(
      |      CAST((2*s.n - 2*f.df + 1) * 22 * h.tf * s.t AS DOUBLE)
      |      / CAST((2*f.df + 1) * (10*h.tf*s.t + 3*s.t + 9*h.dl*s.n) AS DOUBLE)
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM hit h JOIN q ON q.term = h.token
      |  JOIN dfreq f ON f.token = h.token
      |  CROSS JOIN stats s
      |  GROUP BY q.qid, h.doc_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
      |             ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored)
      |SELECT qid, doc_id, score_micro, CAST(rn AS INT) AS rn
      |FROM ranked WHERE rn <= 10""".stripMargin

  /** Mirror of q166: Rocchio-weighted pseudo-relevance feedback. Round
    * 1 is [[bm25OracleSql]]'s scoring kept to the top-10 feedback docs;
    * expansion terms are the feedback docs' tokens minus the original
    * terms, ranked by summed tf (desc, token asc) to 5 per query at
    * weight 4; round 2 rescores the weighted union (originals at 10)
    * with the same exact-integer term micro-scores.
    */
  private val bm25ExpandOracleSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS BIGINT) AS t FROM dl),
      |tok AS (SELECT doc_id, unnest(w.w) AS token FROM w),
      |postings AS (SELECT tok.doc_id, dl.dl, tok.token, count(*) AS tf
      |             FROM tok JOIN dl ON dl.doc_id = tok.doc_id
      |             GROUP BY tok.doc_id, dl.dl, tok.token),
      |q AS (SELECT doc_id AS qid, unnest(list_distinct(list_slice(w.w, 1, 4))) AS term
      |      FROM w WHERE doc_id % 200 = 7),
      |hit1 AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q)),
      |df1 AS (SELECT token, count(*) AS df FROM hit1 GROUP BY token),
      |scored1 AS (SELECT q.qid, h.doc_id,
      |    CAST(sum(CAST(floor(
      |      CAST((2*s.n - 2*f.df + 1) * 22 * h.tf * s.t AS DOUBLE)
      |      / CAST((2*f.df + 1) * (10*h.tf*s.t + 3*s.t + 9*h.dl*s.n) AS DOUBLE)
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM hit1 h JOIN q ON q.term = h.token
      |  JOIN df1 f ON f.token = h.token
      |  CROSS JOIN stats s
      |  GROUP BY q.qid, h.doc_id),
      |fb AS (SELECT qid, doc_id FROM (
      |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
      |      ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored1) r
      |  WHERE rn <= 10),
      |expw AS (SELECT fb.qid, p.token, CAST(sum(p.tf) AS BIGINT) AS wsum
      |         FROM postings p JOIN fb ON fb.doc_id = p.doc_id
      |         WHERE NOT EXISTS (SELECT 1 FROM q
      |                           WHERE q.qid = fb.qid AND q.term = p.token)
      |         GROUP BY fb.qid, p.token),
      |expsel AS (SELECT qid, token AS term, CAST(4 AS BIGINT) AS wq FROM (
      |    SELECT qid, token, row_number() OVER (PARTITION BY qid
      |      ORDER BY wsum DESC, token ASC) AS ern FROM expw) e
      |  WHERE ern <= 5),
      |q2 AS (SELECT qid, term, CAST(10 AS BIGINT) AS wq FROM q
      |       UNION ALL SELECT qid, term, wq FROM expsel),
      |hit2 AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q2)),
      |df2 AS (SELECT token, count(*) AS df FROM hit2 GROUP BY token),
      |scored2 AS (SELECT q2.qid, h.doc_id,
      |    CAST(sum(q2.wq * CAST(floor(
      |      CAST((2*s.n - 2*f.df + 1) * 22 * h.tf * s.t AS DOUBLE)
      |      / CAST((2*f.df + 1) * (10*h.tf*s.t + 3*s.t + 9*h.dl*s.n) AS DOUBLE)
      |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM hit2 h JOIN q2 ON q2.term = h.token
      |  JOIN df2 f ON f.token = h.token
      |  CROSS JOIN stats s
      |  GROUP BY q2.qid, h.doc_id),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
      |             ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored2)
      |SELECT qid, doc_id, score_micro, CAST(rn AS INT) AS rn
      |FROM ranked WHERE rn <= 10""".stripMargin

  /** Shared HLL mirror (q155 batch build, q161 streaming twin — seed ∪
    * drops cover the full table and per-bucket max is idempotent, so
    * both serve identical estimates): same md5 register hash, same raw
    * estimator with the 2⁵⁵-scaled BIGINT sum and one IEEE divide.
    */
  private lazy val hllOracleSql: String = {
    val h = hexToLongSql("md5('hll:' || sh)", 1, 15)
    val c = 0.709 * Curation.HllM * Curation.HllM * math.pow(2, 55)
    s"""WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
       |sg AS (SELECT source,
       |         unnest([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
       |                 FOR i IN range(1, greatest(len(w.w)-2, 0)+1)]) AS sh
       |       FROM w),
       |g AS (SELECT source, sh FROM sg
       |      UNION ALL SELECT '__all__' AS source, sh FROM sg),
       |h AS (SELECT source, $h AS h FROM g),
       |reg AS (SELECT source, h % 64 AS bucket,
       |          max(55 - length(bin(h // 64))) AS r
       |        FROM h GROUP BY source, h % 64),
       |est AS (SELECT source, count(*) AS hll_buckets,
       |          CAST(sum(CAST(1 AS BIGINT) << (55 - r)) AS BIGINT) AS s_occ
       |        FROM reg GROUP BY source)
       |SELECT source, hll_buckets,
       |  CAST(floor($c / CAST(s_occ + (64 - hll_buckets) *
       |    (CAST(1 AS BIGINT) << 55) AS DOUBLE)) AS BIGINT) AS hll_est
       |FROM est""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** q190's mirror: the same floor-division power iteration UNROLLED as
    * `iters` chained CTEs (DuckDB's recursive CTEs disallow the
    * aggregation each step needs). Every op is BIGINT `//` over
    * non-negative values — identical to Spark's `div` — so the two
    * engines agree bit-for-bit; no literals needed, the node count
    * comes from a CTE.
    */
  /** Unrolled k-core peel (the q190 fixed-iteration oracle discipline):
    * round i keeps nodes whose degree in e(i-1) is ≥ k, then restricts
    * the edge relation to kept endpoints. Base graph = the q199
    * co-supplier support edges, symmetrized (so out-count = degree). */
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    val chain = (1 to rounds).map { i =>
      s"""k$i AS (SELECT src AS node FROM e${i - 1}
         |        GROUP BY src HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |        JOIN k$i ka ON e.src = ka.node
         |        JOIN k$i kb ON e.dst = kb.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH p AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
       |           FROM lineitem),
       |base AS (SELECT x.s AS a, y.s AS b
       |         FROM p x JOIN p y ON x.ok = y.ok AND x.s < y.s
       |         GROUP BY x.s, y.s HAVING count(*) >= 5),
       |e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM base
       |         UNION SELECT b, a FROM base),
       |$chain
       |SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
       |FROM e$rounds GROUP BY src""".stripMargin
  }

  /** q218 mirror: pool = BM25 top-20, run = its top-10, qrels = the
    * pool graded by an md5 hash of (qid, doc_id) — deterministic
    * pseudo-judgments over a TREC-style pool — then the exact-integer
    * nDCG/MRR arithmetic of [[graft.operators.Retrieval.ndcgMrrEval]]
    * with the SAME driver-generated discount literals the Spark plan
    * joined (floor(1e6/log2(r+1)), StrictMath, rendered once).
    * `runWhere` drops queries from the run (q232's judged-but-skipped
    * shape); `full = true` switches the final qid join to FULL OUTER
    * so run-absent judged queries score 0 — the TREC convention,
    * mirroring [[graft.operators.Retrieval.ndcgMrrEvalFull]]. */
  private def ndcgEvalOracleSql(k: Int, poolK: Int,
      runWhere: Option[String] = None, full: Boolean = false): String = {
    val disc = graft.operators.Retrieval.dcgDiscountMicros(k)
      .map { case (r, d) => s"($r, $d)" }.mkString(", ")
    val relHash = hexToLongSql(
      "md5('qr:' || CAST(qid AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))",
      1, 15)
    val runPred = runWhere.fold("")(w => s" AND ($w)")
    s"""WITH pool AS MATERIALIZED (SELECT qid, doc_id, rn FROM (
       |${bm25OracleSqlK(poolK)}
       |)),
       |run AS (SELECT * FROM pool WHERE rn <= $k$runPred),
       |qrels AS (SELECT qid, doc_id,
       |            CAST(($relHash) % 4 AS BIGINT) AS rel FROM pool),
       |disc(rn, disc_micro) AS (VALUES $disc),
       |gain AS (SELECT r.qid,
       |    CAST(sum(COALESCE(q.rel, 0) * d.disc_micro) AS BIGINT)
       |      AS dcg_micro,
       |    min(CASE WHEN COALESCE(q.rel, 0) > 0 THEN r.rn END) AS first_rel
       |  FROM run r
       |  LEFT JOIN qrels q ON q.qid = r.qid AND q.doc_id = r.doc_id
       |  JOIN disc d ON d.rn = r.rn
       |  GROUP BY r.qid),
       |ideal AS (SELECT qid,
       |    CAST(count(CASE WHEN rel > 0 THEN 1 END) AS BIGINT) AS n_rel,
       |    CAST(COALESCE(sum(CASE WHEN rel > 0 AND irn <= $k
       |                       THEN rel * disc_micro END), 0) AS BIGINT)
       |      AS idcg_micro
       |  FROM (SELECT qid, doc_id, rel,
       |          row_number() OVER (PARTITION BY qid
       |            ORDER BY rel DESC, doc_id ASC) AS irn FROM qrels) i
       |  LEFT JOIN disc d ON d.rn = i.irn
       |  GROUP BY qid)
       |${
      if (full)
        s"""SELECT COALESCE(g.qid, i.qid) AS qid,
           |  COALESCE(i.n_rel, 0) AS n_rel,
           |  CAST(COALESCE(g.dcg_micro, 0) AS BIGINT) AS dcg_micro,
           |  COALESCE(i.idcg_micro, 0) AS idcg_micro,
           |  CAST(COALESCE(1000000 // g.first_rel, 0) AS BIGINT) AS mrr_micro,
           |  CAST(CASE WHEN COALESCE(i.idcg_micro, 0) > 0
           |       THEN (COALESCE(g.dcg_micro, 0) * 1000000) // i.idcg_micro
           |       ELSE 0 END AS BIGINT) AS ndcg_micro
           |FROM gain g FULL JOIN ideal i ON i.qid = g.qid""".stripMargin
      else
        s"""SELECT g.qid, COALESCE(i.n_rel, 0) AS n_rel, g.dcg_micro,
           |  COALESCE(i.idcg_micro, 0) AS idcg_micro,
           |  CAST(COALESCE(1000000 // g.first_rel, 0) AS BIGINT) AS mrr_micro,
           |  CAST(CASE WHEN COALESCE(i.idcg_micro, 0) > 0
           |       THEN (g.dcg_micro * 1000000) // i.idcg_micro
           |       ELSE 0 END AS BIGINT) AS ndcg_micro
           |FROM gain g LEFT JOIN ideal i ON i.qid = g.qid""".stripMargin
    }""".stripMargin
  }

  private def pageRankOracleSql(iters: Int, dampBp: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT nd.node,
         |    CAST((${10000 - dampBp} * (1000000000000 // nn.n)) // 10000
         |      + ($dampBp * coalesce(c.contrib, 0)) // 10000 AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst AS node,
         |               CAST(sum(p.r // o.d) AS BIGINT) AS contrib
         |             FROM e JOIN r${i - 1} p ON e.src = p.node
         |             JOIN outd o ON e.src = o.node
         |             GROUP BY e.dst) c ON c.node = nd.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |        (SELECT src, dst FROM fwd
       |         UNION ALL SELECT dst AS src, src AS dst FROM fwd) u),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |            (SELECT src AS node FROM e
       |             UNION ALL SELECT dst FROM e) v),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |outd AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
       |         FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$chain
       |SELECT node, r AS "rank" FROM r$iters
       |ORDER BY r DESC, node ASC LIMIT 20""".stripMargin
  }

  /** q265's mirror: [[pageRankOracleSql]]'s unrolled power iteration
    * with the SEED-BIASED teleport — r₀ is the seed distribution and
    * the per-round base term lands only on whitelist nodes, both in
    * the engine's exact driver-literal-free integer order
    * ((10000−d)·(Scale // s)) // 10000.
    */
  private def trustRankOracleSql(iters: Int, dampBp: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT nd.node,
         |    CAST(CASE WHEN sd.node IS NOT NULL
         |        THEN (${10000 - dampBp} * (1000000000000 // sn.s)) // 10000
         |        ELSE 0 END
         |      + ($dampBp * coalesce(c.contrib, 0)) // 10000 AS BIGINT) AS r
         |  FROM nodes nd CROSS JOIN sn
         |  LEFT JOIN sd ON sd.node = nd.node
         |  LEFT JOIN (SELECT e.dst AS node,
         |               CAST(sum(p.r // o.d) AS BIGINT) AS contrib
         |             FROM e JOIN r${i - 1} p ON e.src = p.node
         |             JOIN outd o ON e.src = o.node
         |             GROUP BY e.dst) c ON c.node = nd.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |        (SELECT src, dst FROM fwd
       |         UNION ALL SELECT dst AS src, src AS dst FROM fwd) u),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |            (SELECT src AS node FROM e
       |             UNION ALL SELECT dst FROM e) v),
       |sd AS MATERIALIZED (SELECT nd.node FROM nodes nd
       |       JOIN (SELECT DISTINCT s_suppkey * 2 + 1 AS node
       |             FROM supplier WHERE s_suppkey % 10 = 0) w
       |         ON w.node = nd.node),
       |sn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS s FROM sd),
       |outd AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
       |         FROM e GROUP BY src),
       |r0 AS (SELECT nd.node,
       |         CAST(CASE WHEN sd.node IS NOT NULL
       |           THEN 1000000000000 // sn.s ELSE 0 END AS BIGINT) AS r
       |       FROM nodes nd CROSS JOIN sn
       |       LEFT JOIN sd ON sd.node = nd.node),
       |$chain
       |SELECT node, r AS trust FROM r$iters
       |ORDER BY r DESC, node ASC LIMIT 20""".stripMargin
  }

  /** q197's mirror: the HITS fixed-point iteration unrolled; the
    * per-round max-normalizer is a scalar subquery over the same exact
    * integers Spark collects to the driver.
    */
  private def hitsOracleSql(iters: Int): String = {
    val s = graft.operators.Graph.HitsScale
    // every CTE level is referenced more than once (the scalar-subquery
    // normalizer plus the next level); MATERIALIZED stops DuckDB from
    // inlining each reference, which would re-evaluate the whole chain
    // exponentially
    val chain = (1 to iters).map { i =>
      s"""a${i}r AS MATERIALIZED (SELECT nd.node, coalesce(v.v, 0) AS auth
         |  FROM nodes nd LEFT JOIN
         |    (SELECT e.dst AS node, CAST(sum(h.hub) AS BIGINT) AS v
         |     FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst) v
         |    ON v.node = nd.node),
         |a$i AS MATERIALIZED (SELECT node,
         |  (auth * $s) // (SELECT max(auth) FROM a${i}r) AS auth
         |  FROM a${i}r),
         |h${i}r AS MATERIALIZED (SELECT nd.node, coalesce(v.v, 0) AS hub
         |  FROM nodes nd LEFT JOIN
         |    (SELECT e.src AS node, CAST(sum(a.auth) AS BIGINT) AS v
         |     FROM e JOIN a$i a ON e.dst = a.node GROUP BY e.src) v
         |    ON v.node = nd.node),
         |h$i AS MATERIALIZED (SELECT node,
         |  (hub * $s) // (SELECT max(hub) FROM h${i}r) AS hub
         |  FROM h${i}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS src,
       |             l_suppkey * 2 + 1 AS dst
       |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |            (SELECT src AS node FROM e
       |             UNION ALL SELECT dst FROM e) v),
       |h0 AS (SELECT node, CAST($s AS BIGINT) AS hub FROM nodes),
       |$chain
       |SELECT h$iters.node AS node, CAST(h$iters.hub AS BIGINT) AS hub,
       |  CAST(a$iters.auth AS BIGINT) AS auth
       |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node
       |ORDER BY auth DESC, hub DESC, h$iters.node ASC LIMIT 20""".stripMargin
  }

  /** q198's mirror: BFS relaxation unrolled — round k's relation is the
    * min over (previous, previous-via-one-edge + 1).
    */
  private def bfsOracleSql(maxHops: Int): String = {
    val chain = (1 to maxHops).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
         |  SELECT node, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, p.dist + 1 AS dist
         |  FROM e JOIN d${i - 1} p ON e.src = p.node) u
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH fwd AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |        (SELECT src, dst FROM fwd
       |         UNION ALL SELECT dst AS src, src AS dst FROM fwd) u),
       |d0 AS (SELECT DISTINCT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
       |       FROM customer WHERE c_custkey % 500 = 1),
       |$chain
       |SELECT node, dist FROM d$maxHops""".stripMargin
  }

  /** q191's mirror: refit the ridge model with the IDENTICAL exact-
    * integer moments + deterministic driver solve (so the micro weight
    * literals reproduce bit-for-bit), then rescore in pure BIGINT.
    */
  private def ridgeOracleSql(spark: SparkSession, dir: String): String = {
    val joined = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        cents(col("p_retailprice")).as("price_cents"),
        cents(col("l_extendedprice")).as("y_cents"))
    val fit = graft.operators.Regression.fitRidge(joined, "y_cents",
      Seq("qty", "price_cents"), lambda = 1e6)
    val Seq(w0, w1, w2) = fit.wMicro
    s"""WITH j AS (SELECT l_orderkey, l_linenumber,
       |             CAST(l_quantity AS BIGINT) AS qty,
       |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
       |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y_cents
       |           FROM lineitem JOIN part ON l_partkey = p_partkey),
       |s AS (SELECT l_orderkey, l_linenumber, y_cents,
       |        CAST(($w0) + ($w1) * qty + ($w2) * price_cents AS BIGINT)
       |          AS pred_micro
       |      FROM j)
       |SELECT l_orderkey, l_linenumber, y_cents, pred_micro,
       |  CAST(y_cents * 1000000 - pred_micro AS BIGINT) AS resid_micro
       |FROM s
       |ORDER BY abs(y_cents * 1000000 - pred_micro) DESC,
       |  l_orderkey ASC, l_linenumber ASC
       |LIMIT 50""".stripMargin
  }

  /** q192's mirror: refit the hashed NB model (exact integer counts →
    * identical StrictMath literals), render the classes×buckets table
    * as VALUES, and replay the integer argmax.
    */
  private def nbOracleSql(spark: SparkSession, dir: String): String = {
    val docs = Tables(spark, dir, "documents")
    val model = graft.operators.Classify.fitHashedNb(
      docs.filter(col("doc_id") % 10 =!= 0), "text", "lang", nBuckets = 64)
    val likeVals = model.likeMicro.map { case (l, b, lp) =>
      s"('${l.replace("'", "''")}', $b, CAST($lp AS BIGINT))"
    }.mkString(",\n       ")
    val priorVals = model.labels.map { l =>
      s"('${l.replace("'", "''")}', CAST(${model.priorMicro(l)} AS BIGINT))"
    }.mkString(", ")
    val h = hexToLongSql("md5('nb:' || tok)", 1, 15)
    s"""WITH test AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM test),
       |bc AS (SELECT doc_id, CAST($h AS BIGINT) % 64 AS bucket,
       |         CAST(count(*) AS BIGINT) AS cnt
       |       FROM tok GROUP BY 1, 2),
       |lik(label, bucket, lp_micro) AS (VALUES
       |       $likeVals),
       |pri(label, prior_micro) AS (VALUES $priorVals),
       |sc AS (SELECT bc.doc_id, lik.label,
       |         CAST(sum(bc.cnt * lik.lp_micro) AS BIGINT) AS ll_micro
       |       FROM bc JOIN lik ON lik.bucket = bc.bucket
       |       GROUP BY bc.doc_id, lik.label),
       |tot AS (SELECT sc.doc_id, sc.label,
       |          CAST(pri.prior_micro + sc.ll_micro AS BIGINT) AS score_micro
       |        FROM sc JOIN pri ON pri.label = sc.label),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |             ORDER BY score_micro DESC, label ASC) AS rn FROM tot)
       |SELECT doc_id, label AS pred_label, score_micro
       |FROM ranked WHERE rn = 1""".stripMargin
  }

  /** Shared drift-monitor mirror (q185 batch report, q196 streaming
    * twin, q202 absorb lifecycle — all serve the full-corpus TVD).
    */
  private lazy val driftOracleSql: String = {
    val h = hexToLongSql("md5('drift:' || tok)", 1, 15)
    s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
       |             FROM documents),
       |b AS (SELECT source, CAST($h AS BIGINT) % 64 AS bucket FROM tok),
       |bg AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS o
       |       FROM b GROUP BY source, bucket),
       |tot AS (SELECT source, CAST(sum(o) AS BIGINT) AS n_tokens
       |        FROM bg GROUP BY source),
       |corp AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c FROM bg
       |         GROUP BY bucket),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM corp),
       |grid AS (SELECT tot.source, tot.n_tokens, k.bucket
       |         FROM tot CROSS JOIN (SELECT unnest(range(64)) AS bucket) k)
       |SELECT g.source, g.n_tokens,
       |  CAST(sum(abs(coalesce(bg.o, 0) * 1000000 // g.n_tokens
       |               - corp.c * 1000000 // n.n_total)) AS BIGINT)
       |    AS tvd_micro
       |FROM grid g
       |LEFT JOIN bg ON bg.source = g.source AND bg.bucket = g.bucket
       |JOIN corp ON corp.bucket = g.bucket
       |CROSS JOIN n
       |GROUP BY g.source, g.n_tokens""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // gid bit order matches Spark grouping_id(): first cube column MSB
    "q186_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
        |    AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q187_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
        |    AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,
    // the independent mirror of unpivot is the union-of-selects it
    // replaces
    "q188_unpivot" ->
      """WITH wide AS (SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_price_cents
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_qty', sum_qty FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price_cents', sum_price_cents FROM wide""".stripMargin,
    "q189_event_deltas" ->
      """WITH w AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER win AS seq,
        |    epoch_us(ts) - lag(epoch_us(ts), 1) OVER win AS gap_us,
        |    lead(epoch_us(ts), 1) OVER win - epoch_us(ts) AS next_gap_us,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS mov3_cents
        |  FROM events WHERE user_id % 50 = 7
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, CAST(seq AS INT) AS seq,
        |  gap_us, next_gap_us, mov3_cents
        |FROM w""".stripMargin,
    "q190_pagerank" -> pageRankOracleSql(iters = 6, dampBp = 8500),
    "q265_trustrank" -> trustRankOracleSql(iters = 6, dampBp = 8500),
    "q197_hits" -> hitsOracleSql(iters = 4),
    "q198_bfs_hops" -> bfsOracleSql(maxHops = 4),
    // the triple self-join triangle definition over the same
    // support-thresholded co-supplier edges
    "q199_triangles" ->
      """WITH p AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
        |           FROM lineitem),
        |e AS (SELECT x.s AS a, y.s AS b
        |      FROM p x JOIN p y ON x.ok = y.ok AND x.s < y.s
        |      GROUP BY x.s, y.s HAVING count(*) >= 5),
        |tri AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
        |        FROM e ab JOIN e bc ON ab.b = bc.a
        |        JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
        |corners AS (SELECT x AS node FROM tri
        |            UNION ALL SELECT y FROM tri
        |            UNION ALL SELECT z FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS triangles
        |FROM corners GROUP BY node""".stripMargin,
    "q201_exact_quantiles" ->
      """WITH li AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v
        |            FROM lineitem),
        |r AS (SELECT l_returnflag, v,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY v)
        |          AS rn,
        |        count(*) OVER (PARTITION BY l_returnflag) AS n FROM li),
        |q(q_name, bp) AS (VALUES ('p25', 2500), ('p50', 5000),
        |                         ('p90', 9000)),
        |pos AS (SELECT r.l_returnflag, r.v, r.rn, q.q_name,
        |          ((n - 1) * bp) // 10000 AS lo,
        |          ((n - 1) * bp) % 10000 AS frac
        |        FROM r CROSS JOIN q
        |        WHERE rn = ((n - 1) * bp) // 10000 + 1
        |           OR rn = least(((n - 1) * bp) // 10000 + 2, n))
        |SELECT l_returnflag, q_name,
        |  CAST(max(CASE WHEN rn = lo + 1 THEN v END) * 1000000 +
        |    (coalesce(max(CASE WHEN rn = lo + 2 THEN v END),
        |              max(CASE WHEN rn = lo + 1 THEN v END))
        |     - max(CASE WHEN rn = lo + 1 THEN v END))
        |    * max(frac) * 100 AS BIGINT) AS q_micro
        |FROM pos GROUP BY l_returnflag, q_name""".stripMargin,
    "q203_rank_features" ->
      """WITH e AS (SELECT event_id, event_type,
        |             CAST(round(value * 100) AS BIGINT) AS value_cents
        |           FROM events),
        |r AS (SELECT event_id, event_type, value_cents,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY value_cents, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n_rows
        |      FROM e)
        |SELECT event_id, event_type, value_cents, CAST(rn AS INT) AS rn,
        |  CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(CASE WHEN n_rows = 1 THEN 0
        |       ELSE CAST(rn - 1 AS BIGINT) * 1000000 // (n_rows - 1) END
        |    AS BIGINT) AS pct_micro,
        |  CAST(((rn - 1) * 10) // n_rows AS BIGINT) AS decile
        |FROM r WHERE event_id % 37 = 0""".stripMargin,
    // same change-detection windows: version starts where the tracked
    // attribute differs from its lag (rn = 1 covers the first row)
    "q204_scd2_history" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |           FROM events WHERE user_id % 7 = 0),
        |o AS (SELECT user_id, us, event_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS prev,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS rn
        |      FROM e),
        |v AS (SELECT user_id, event_type, us AS valid_from_us, event_id
        |      FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) AS valid_to_us,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) AS INT) AS version,
        |  (lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, event_id) IS NULL) AS is_current
        |FROM v""".stripMargin,
    // ONE pass over the whole log — the staged Spark replay (base from
    // the pre-cutoff slice, then apply) must land on exactly this state
    "q205_cdc_apply" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
        |               AS op,
        |             event_type,
        |             CAST(round(value * 100) AS BIGINT) AS value_cents
        |           FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_type, value_cents
        |FROM r WHERE rn = 1 AND op = 'U'""".stripMargin,
    // same two-step floor division, same discount, same total-order cut
    "q206_collocations" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT unnest(w.w) AS w FROM w),
        |cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM tok),
        |bg AS (SELECT unnest([w.w[i] || ' ' || w.w[i+1]
        |                     FOR i IN range(1, greatest(len(w.w) - 1, 0) + 1)])
        |         AS pair FROM w),
        |cb AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_xy FROM bg
        |       GROUP BY pair HAVING count(*) > 5)
        |SELECT pair, c_xy, cx.c AS c_x, cy.c AS c_y,
        |  CAST(((c_xy - 5) * 1000000 // cx.c) * t_total // cy.c AS BIGINT)
        |    AS score_micro
        |FROM cb
        |JOIN cu cx ON cx.w = string_split(pair, ' ')[1]
        |JOIN cu cy ON cy.w = string_split(pair, ' ')[2]
        |CROSS JOIN t
        |ORDER BY score_micro DESC, pair ASC LIMIT 50""".stripMargin,
    "q200_cohort_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM a
        |      GROUP BY user_id)
        |SELECT c.cohort_wk, a.wk - c.cohort_wk AS age_wk,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY c.cohort_wk, a.wk - c.cohort_wk""".stripMargin,
    // the change feed must equal each append batch exactly
    "q193_postings_changes" ->
      """SELECT CAST(1 AS BIGINT) AS gen, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |FROM documents WHERE doc_id % 20 = 0
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT)
        |FROM documents WHERE doc_id % 20 = 10""".stripMargin,
    // the O(n²) dominance DEFINITION — deliberately not the sort-based
    // algorithm the operator uses
    "q194_pareto_parts" ->
      """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size_l,
        |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        |           FROM part)
        |SELECT p_partkey, size_l, price_cents FROM p q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p d
        |  WHERE d.size_l >= q.size_l AND d.price_cents >= q.price_cents
        |    AND (d.size_l > q.size_l OR d.price_cents > q.price_cents))""".stripMargin,
    "q195_grouped_median" ->
      """WITH li AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty
        |            FROM lineitem),
        |r AS (SELECT l_returnflag, qty,
        |        row_number() OVER (PARTITION BY l_returnflag ORDER BY qty)
        |          AS rn,
        |        count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |      FROM li)
        |SELECT l_returnflag, CAST(cnt AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN qty ELSE 0 END) +
        |       sum(CASE WHEN rn = cnt // 2 + 1 THEN qty ELSE 0 END)
        |    AS BIGINT) AS median2x
        |FROM r GROUP BY l_returnflag, cnt""".stripMargin,
    // snapshot probe ≡ q101's full-index cross-pair probe: the
    // committed set is exactly doc_id % 10 <> 0 (seed ∪ the committed
    // % 10 = 5 append); torn % 20 = 0 files leaking in would emit
    // probe-probe pairs the predicate excludes
    "q208_band_snapshot_serve" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashOracleSql) p
         |WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)""".stripMargin,
    // as-of-gen-0 phrase serve ≡ the seed corpus alone; the phrase
    // side reads the unrestricted split (a later-committed doc may
    // query, never match at gen 0)
    "q209_phrase_time_travel" ->
      phraseRestrictedOracleSql("doc_id % 10 <> 0"),
    // same gram text (space-joined 5-gram), same md5 fingerprint, same
    // island-merge windows — engine-exact integers throughout
    "q210_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, s.pos AS pos, s.fp AS fp FROM
        |  (SELECT doc_id,
        |     unnest([{'pos': i,
        |              'fp': md5(array_to_string(list_slice(w, i, i + 4), ' '))}
        |             FOR i IN range(1, len(w) - 5 + 2)]) AS s
        |   FROM t) x),
        |dup AS (SELECT fp FROM (SELECT fp, count(*) AS c FROM g GROUP BY fp)
        |        WHERE c >= 2),
        |h AS (SELECT doc_id, pos, pos + 4 AS e FROM g JOIN dup USING (fp)),
        |i1 AS (SELECT doc_id, pos, e,
        |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_end
        |       FROM h),
        |i2 AS (SELECT doc_id, pos, e,
        |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1
        |              THEN 1 ELSE 0 END AS brk
        |       FROM i1),
        |i3 AS (SELECT doc_id, pos, e,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |       FROM i2)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(e) AS BIGINT) AS span_end,
        |  CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM i3 GROUP BY doc_id, island""".stripMargin,
    // same 60-bit md5-prefix hash, same (h, −pos) struct-min window —
    // the rightmost-tie selection transfers because both engines order
    // structs field-by-field
    "q211_winnow_fingerprints" -> {
      val h = hexToLongSql("md5(array_to_string(list_slice(w, i, i + 3), ' '))", 1, 15)
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |g AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM
         |  (SELECT doc_id,
         |     unnest([{'pos': i, 'h': CAST($h AS BIGINT)}
         |             FOR i IN range(1, len(w) - 4 + 2)]) AS s
         |   FROM t) x),
         |sel AS (SELECT doc_id,
         |        min({'h': h, 'np': -pos})
         |          OVER (PARTITION BY doc_id ORDER BY pos
         |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         |        count(*)
         |          OVER (PARTITION BY doc_id ORDER BY pos
         |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
         |      FROM g)
         |SELECT DISTINCT doc_id, CAST(-m.np AS BIGINT) AS fp_pos,
         |  CAST(m.h AS BIGINT) AS fp
         |FROM sel WHERE c = 4""".stripMargin
    },
    // q211's fingerprint SQL feeding the pair generator: index side =
    // the committed corpus (doc_id % 10 <> 0 — the torn % 20 = 0 batch
    // never commits), batch side = % 10 = 0, df-cap then shared-count
    "q214_winnow_index_serve" ->
      s"""WITH $winnowFpCtes,
         |idx AS (SELECT doc_id AS id_a, fp FROM f WHERE doc_id % 10 <> 0),
         |keep AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM idx GROUP BY fp)
         |         WHERE c2 <= 50),
         |b AS (SELECT doc_id AS id_b, fp FROM f WHERE doc_id % 10 = 0)
         |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM idx JOIN keep USING (fp) JOIN b USING (fp)
         |GROUP BY id_a, id_b HAVING count(*) >= 2""".stripMargin,
    // the winnow-gated ingest: a drop doc admits iff NO ≥2-shared-
    // capped-fingerprint pair links it to the corpus (drop 1) / corpus
    // ∪ drop-1 admissions (drop 2) — the df-cap recomputes per step
    // exactly as the Spark gate's probe sees the index grow
    "q215_winnow_stream_ingest" ->
      s"""WITH $winnowFpCtes,
         |cor AS (SELECT doc_id AS b, fp FROM f WHERE doc_id % 10 <> 0),
         |k1 AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM cor GROUP BY fp)
         |       WHERE c2 <= 50),
         |m1 AS (SELECT bf.doc_id AS a, cor.b AS b
         |       FROM (SELECT doc_id, fp FROM f WHERE doc_id % 20 = 0) bf
         |       JOIN k1 USING (fp) JOIN cor USING (fp)
         |       GROUP BY bf.doc_id, cor.b HAVING count(*) >= 2),
         |adm1 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 0
         |         AND NOT EXISTS (SELECT 1 FROM m1 WHERE m1.a = d.doc_id)),
         |idx2 AS (SELECT b, fp FROM cor
         |         UNION ALL SELECT doc_id AS b, fp FROM f
         |         WHERE doc_id IN (SELECT doc_id FROM adm1)),
         |k2 AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM idx2 GROUP BY fp)
         |       WHERE c2 <= 50),
         |m2 AS (SELECT bf.doc_id AS a, idx2.b AS b
         |       FROM (SELECT doc_id, fp FROM f WHERE doc_id % 20 = 10) bf
         |       JOIN k2 USING (fp) JOIN idx2 USING (fp)
         |       GROUP BY bf.doc_id, idx2.b HAVING count(*) >= 2),
         |adm2 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 10
         |         AND NOT EXISTS (SELECT 1 FROM m2 WHERE m2.a = d.doc_id))
         |SELECT doc_id FROM adm1 UNION ALL SELECT doc_id FROM adm2""".stripMargin,
    // q214's pair mirror with the index side restricted to delete
    // SURVIVORS (% 7 <> 3) — the df-cap recomputes over survivors too
    "q216_winnow_delete_probe" ->
      s"""WITH $winnowFpCtes,
         |idx AS (SELECT doc_id AS id_a, fp FROM f
         |        WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 3),
         |keep AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM idx GROUP BY fp)
         |         WHERE c2 <= 50),
         |b AS (SELECT doc_id AS id_b, fp FROM f WHERE doc_id % 10 = 0)
         |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM idx JOIN keep USING (fp) JOIN b USING (fp)
         |GROUP BY id_a, id_b HAVING count(*) >= 2""".stripMargin,
    // same owner rule (struct-min over (doc_id, pos)), same island
    // merge as q210, then the per-doc token charge with COALESCE 0
    "q212_span_trim" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, s.pos AS pos, s.fp AS fp FROM
        |  (SELECT doc_id,
        |     unnest([{'pos': i,
        |              'fp': md5(array_to_string(list_slice(w, i, i + 4), ' '))}
        |             FOR i IN range(1, len(w) - 5 + 2)]) AS s
        |   FROM t) x),
        |o AS (SELECT fp, count(*) AS c, min({'d': doc_id, 'p': pos}) AS owner
        |      FROM g GROUP BY fp),
        |d AS (SELECT fp, owner FROM o WHERE c >= 2),
        |f AS (SELECT doc_id, pos, pos + 4 AS e FROM g JOIN d USING (fp)
        |      WHERE NOT (doc_id = owner.d AND pos = owner.p)),
        |i1 AS (SELECT doc_id, pos, e,
        |         max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_end
        |       FROM f),
        |i2 AS (SELECT doc_id, pos, e,
        |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1
        |              THEN 1 ELSE 0 END AS brk
        |       FROM i1),
        |i3 AS (SELECT doc_id, pos, e,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |       FROM i2),
        |sp AS (SELECT doc_id, max(e) - min(pos) + 1 AS span_tokens
        |       FROM i3 GROUP BY doc_id, island),
        |tr AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS trimmed
        |       FROM sp GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  COALESCE(tr.trimmed, 0) AS trimmed_tokens,
        |  CAST(len(t.w) AS BIGINT) - COALESCE(tr.trimmed, 0) AS kept_tokens
        |FROM t LEFT JOIN tr USING (doc_id)""".stripMargin,
    "q217_kcore" -> kCoreOracleSql(k = 3, rounds = 4),
    "q218_ndcg_eval" -> ndcgEvalOracleSql(k = 10, poolK = 20),
    // q218's TREC-convention sibling: run skips qid % 3 == 0, final
    // join FULL OUTER so judged-but-skipped queries score 0
    "q232_ndcg_eval_full" -> ndcgEvalOracleSql(k = 10, poolK = 20,
      runWhere = Some("qid % 3 <> 0"), full = true),
    // every (train, eval) pair sharing a distinct 4-gram, recounted
    // from scratch
    "q237_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ww FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        [ww[i] || ' ' || ww[i+1] || ' ' || ww[i+2] || ' ' ||
        |         ww[i+3]
        |         FOR i IN range(1, greatest(len(ww) - 3, 0) + 1)])) AS g
        |      FROM w),
        |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 100 <> 3),
        |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 100 = 3)
        |SELECT tr.doc_id, ev.eval_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM tr JOIN ev USING (g)
        |GROUP BY tr.doc_id, ev.eval_id""".stripMargin,
    // gating semantics ≡ q123 (corpus ∪ earlier admissions), so the
    // oracle is the same sequential admission chain — the engine side
    // differs in WHERE admissions live (the committed store itself,
    // under the exactly-once batch ledger), not in what is admitted
    "q238_committed_stream_ingest" ->
      s"""WITH pairs AS (SELECT id_a, id_b FROM ($minhashOracleSql) p),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |        UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
         |adm1 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 0
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id AND sym.b % 10 <> 0)),
         |adm2 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 10
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id
         |                    AND (sym.b % 10 <> 0
         |                         OR sym.b IN (SELECT doc_id FROM adm1))))
         |SELECT doc_id FROM adm1 UNION ALL SELECT doc_id FROM adm2""".stripMargin,
    // candidates restricted to the top-quarter id range BEFORE the
    // top-k, stats over the WHOLE corpus, df over restricted hits —
    // exactly the filtered-search scoring contract the ranged load
    // implements (zone maps only change which files are read)
    // the lexicographically-least source's per-language length profile
    // (the serve side proves string-envelope file skipping; the rows
    // are a plain restricted aggregate)
    "q256_docstore_source_serve" ->
      """WITH s AS (SELECT min(source) AS src FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents, s WHERE source = s.src
        |GROUP BY lang""".stripMargin,
    // the committed bronze ingest serves the full corpus (seed ∪ both
    // drops) — a doubled replay would double-count documents and
    // tokens alike, which is exactly what this plain profile catches
    "q258_committed_doc_ingest" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY source""".stripMargin,
    // the generation-0 pinned build must rank exactly like a corpus
    // that never held the gen-1 append — the restricted BM25 mirror
    // (query side stays unrestricted: an excluded doc may still query)
    "q260_lineage_pinned_build" ->
      bm25RestrictedOracleSql("doc_id % 10 <> 0"),
    // q54's quantize-then-exact-cosine arithmetic (identical IEEE op
    // set: integer dot, two sqrts, one multiply, one divide); the
    // closest-eval tie-break is (cosine DESC, eval_id ASC), matching
    // the engine's lexicographic struct-max
    "q261_semantic_decontam" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |           FROM embeddings),
        |ev AS (SELECT vec_id AS eval_id, v,
        |         sqrt(list_dot_product(v, v)) AS en
        |       FROM e WHERE vec_id % 25 = 0),
        |co AS (SELECT vec_id AS corpus_id, v,
        |         sqrt(list_dot_product(v, v)) AS cn
        |       FROM e WHERE vec_id % 25 <> 0),
        |hits AS (SELECT corpus_id, eval_id,
        |           list_dot_product(co.v, ev.v) / (co.cn * ev.en) AS cosine
        |         FROM co CROSS JOIN ev
        |         WHERE list_dot_product(co.v, ev.v) / (co.cn * ev.en) >= 0.3),
        |r AS (SELECT corpus_id, eval_id, cosine,
        |        count(*) OVER (PARTITION BY corpus_id) AS n_eval_hits,
        |        row_number() OVER (PARTITION BY corpus_id
        |          ORDER BY cosine DESC, eval_id ASC) AS rn
        |      FROM hits)
        |SELECT corpus_id, CAST(n_eval_hits AS BIGINT) AS n_eval_hits,
        |  eval_id AS best_eval_id, cosine AS best_cosine
        |FROM r WHERE rn = 1""".stripMargin,
    "q240_zonemap_range_serve" ->
      """WITH wq AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |mxv AS (SELECT max(doc_id) AS mx FROM documents),
        |dla AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM wq),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                 CAST(sum(dl) AS BIGINT) AS t FROM dla),
        |w AS (SELECT wq.* FROM wq, mxv WHERE wq.doc_id > (mx * 3) // 4),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w),
        |tok AS (SELECT doc_id, unnest(w.w) AS token FROM w),
        |postings AS (SELECT tok.doc_id, dl.dl, tok.token, count(*) AS tf
        |             FROM tok JOIN dl ON dl.doc_id = tok.doc_id
        |             GROUP BY tok.doc_id, dl.dl, tok.token),
        |q AS (SELECT doc_id AS qid,
        |        unnest(list_distinct(list_slice(wq.w, 1, 4))) AS term
        |      FROM wq WHERE doc_id % 200 = 7),
        |hit AS (SELECT * FROM postings WHERE token IN (SELECT term FROM q)),
        |dfreq AS (SELECT token, count(*) AS df FROM hit GROUP BY token),
        |scored AS (SELECT q.qid, h.doc_id,
        |    CAST(sum(CAST(floor(
        |      CAST((2*s.n - 2*f.df + 1) * 22 * h.tf * s.t AS DOUBLE)
        |      / CAST((2*f.df + 1) * (10*h.tf*s.t + 3*s.t + 9*h.dl*s.n) AS DOUBLE)
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
        |  FROM hit h JOIN q ON q.term = h.token
        |  JOIN dfreq f ON f.token = h.token
        |  CROSS JOIN stats s
        |  GROUP BY q.qid, h.doc_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
        |             ORDER BY score_micro DESC, doc_id ASC) AS rn FROM scored)
        |SELECT qid, doc_id, score_micro, CAST(rn AS INT) AS rn
        |FROM ranked WHERE rn <= 10""".stripMargin,
    // the committed ingest serves the full corpus (base ∪ both drops),
    // so the standard BM25 mirror applies — a doubled replay would
    // break it through doubled tf/df/stats
    "q241_committed_postings_ingest" -> bm25OracleSql,
    // q215's sequential admission chain, restricted to documents that
    // fingerprint at all (the store can only hold docs with ≥ 1 fp)
    "q242_committed_winnow_ingest" ->
      s"""WITH $winnowFpCtes,
         |cor AS (SELECT doc_id AS b, fp FROM f WHERE doc_id % 10 <> 0),
         |k1 AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM cor GROUP BY fp)
         |       WHERE c2 <= 50),
         |m1 AS (SELECT bf.doc_id AS a, cor.b AS b
         |       FROM (SELECT doc_id, fp FROM f WHERE doc_id % 20 = 0) bf
         |       JOIN k1 USING (fp) JOIN cor USING (fp)
         |       GROUP BY bf.doc_id, cor.b HAVING count(*) >= 2),
         |adm1 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 0
         |         AND NOT EXISTS (SELECT 1 FROM m1 WHERE m1.a = d.doc_id)),
         |idx2 AS (SELECT b, fp FROM cor
         |         UNION ALL SELECT doc_id AS b, fp FROM f
         |         WHERE doc_id IN (SELECT doc_id FROM adm1)),
         |k2 AS (SELECT fp FROM (SELECT fp, count(*) AS c2 FROM idx2 GROUP BY fp)
         |       WHERE c2 <= 50),
         |m2 AS (SELECT bf.doc_id AS a, idx2.b AS b
         |       FROM (SELECT doc_id, fp FROM f WHERE doc_id % 20 = 10) bf
         |       JOIN k2 USING (fp) JOIN idx2 USING (fp)
         |       GROUP BY bf.doc_id, idx2.b HAVING count(*) >= 2),
         |adm2 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 10
         |         AND NOT EXISTS (SELECT 1 FROM m2 WHERE m2.a = d.doc_id))
         |SELECT doc_id FROM adm1
         |WHERE doc_id IN (SELECT doc_id FROM f)
         |UNION ALL
         |SELECT doc_id FROM adm2
         |WHERE doc_id IN (SELECT doc_id FROM f)""".stripMargin,
    // (the suffix mirrors q246/q250/q251/q253/q254/q257 live in
    // [[oracleSqlDynamic]]: their doubling/ANSV depths are derived
    // from the corpus at generation time — ADVICE r13)
    // the same class-based placement from the oracle's own window rank
    // (the engine's two-phase index and the window agree because the
    // (k, n desc, id) order is total)
    "q239_bin_packing" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n, 128 // n AS k FROM d
        |      WHERE n BETWEEN 1 AND 128),
        |r AS (SELECT doc_id, n, k,
        |        row_number() OVER (ORDER BY k, n DESC, doc_id) - 1 AS idx
        |      FROM c),
        |f AS (SELECT k, min(idx) AS first_idx, count(*) AS cnt
        |      FROM r GROUP BY k),
        |b AS (SELECT k, first_idx,
        |        COALESCE(SUM((cnt + k - 1) // k) OVER (ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS bin_base
        |      FROM f)
        |SELECT CAST(b.bin_base + (r.idx - b.first_idx) // r.k AS BIGINT)
        |         AS bin_id,
        |       r.doc_id,
        |       CAST((r.idx - b.first_idx) % r.k AS BIGINT) AS slot,
        |       r.n AS n_tokens, r.k AS slots
        |FROM r JOIN b USING (k)""".stripMargin,
    // the same concat-and-chunk spans from a window cumsum (the oracle
    // may use the single-threaded window; the engine's two-phase scan
    // must land on identical offsets)
    "q235_sequence_packing" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents
        |           WHERE len(string_split(text, ' ')) > 0),
        |s AS (SELECT doc_id, n,
        |        CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start
        |      FROM d),
        |e AS (SELECT doc_id, n, start,
        |        unnest(generate_series(start // 512, (start + n - 1) // 512))
        |          AS chunk_id
        |      FROM s)
        |SELECT chunk_id, doc_id,
        |  greatest(0, chunk_id * 512 - start) AS doc_off,
        |  greatest(start, chunk_id * 512) - chunk_id * 512 AS chunk_off,
        |  least(start + n, (chunk_id + 1) * 512)
        |    - greatest(start, chunk_id * 512) AS len
        |FROM e""".stripMargin,
    // same bigram-type relation, same continuation counts, same two
    // floor divisions in the documented order
    "q219_kneser_ney" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bgs AS (SELECT unnest([w.w[i] || ' ' || w.w[i+1]
        |                      FOR i IN range(1, greatest(len(w.w) - 1, 0) + 1)])
        |          AS pair FROM w),
        |bg AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_xy,
        |         string_split(pair, ' ')[1] AS w1,
        |         string_split(pair, ' ')[2] AS w2
        |       FROM bgs GROUP BY pair),
        |pre AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_prefix,
        |          CAST(count(*) AS BIGINT) AS n_cont FROM bg GROUP BY w1),
        |succ AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_pred
        |         FROM bg GROUP BY w2),
        |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg)
        |SELECT pair, c_xy, c_prefix, n_cont,
        |  CAST((n_pred * 1000000) // n_types AS BIGINT) AS cont_micro,
        |  CAST((greatest(4 * c_xy - 3, 0) * 1000000) // (4 * c_prefix)
        |     + (3 * n_cont * ((n_pred * 1000000) // n_types))
        |       // (4 * c_prefix) AS BIGINT) AS p_micro
        |FROM bg JOIN pre USING (w1) JOIN succ USING (w2) CROSS JOIN ty
        |WHERE c_xy >= 3
        |ORDER BY p_micro DESC, pair ASC LIMIT 300""".stripMargin,
    // same delete-1 neighborhoods (list comprehension mirror of the
    // transform/substr expansion), same 2nd-char corruption, same
    // levenshtein verify, same (freq desc, term asc) ranking
    "q221_spell_correct" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |counts AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |dict AS (SELECT w AS term, c AS freq FROM counts
        |         WHERE c >= 5 AND len(w) >= 4),
        |qs AS (SELECT w[1:1] || w[3:] AS q FROM counts
        |       WHERE c >= 5 AND len(w) >= 5),
        |dk AS (SELECT term, freq,
        |         unnest(list_distinct([term] ||
        |           [term[1:i-1] || term[i+1:]
        |            FOR i IN range(1, len(term) + 1)])) AS key
        |       FROM dict),
        |qk AS (SELECT q,
        |         unnest(list_distinct([q] ||
        |           [q[1:i-1] || q[i+1:] FOR i IN range(1, len(q) + 1)])) AS key
        |       FROM qs WHERE len(q) >= 4),
        |cand AS (SELECT DISTINCT q, term, freq FROM qk JOIN dk USING (key)),
        |v AS (SELECT q, term, freq,
        |        CAST(levenshtein(q, term) AS INT) AS dist
        |      FROM cand WHERE levenshtein(q, term) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY q
        |        ORDER BY freq DESC, term ASC) AS rn FROM v)
        |SELECT q, term, freq, dist, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 3""".stripMargin,
    // same per-(source, score) count relation, same 2U accumulation,
    // same two chained milli floors
    "q222_roc_auc" ->
      """WITH d AS (SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','of','and','to','in','a','is','that')))
        |      AS BIGINT) AS score,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS label
        |  FROM documents),
        |g AS (SELECT source, score, CAST(count(*) AS BIGINT) AS n_at,
        |        CAST(sum(label) AS BIGINT) AS p_at
        |      FROM d GROUP BY source, score),
        |c AS (SELECT *, n_at - p_at AS neg_at,
        |        CAST(sum(n_at - p_at) OVER (PARTITION BY source
        |          ORDER BY score) AS BIGINT) AS cum_neg
        |      FROM g),
        |a AS (SELECT source, CAST(sum(p_at) AS BIGINT) AS n_pos,
        |        CAST(sum(neg_at) AS BIGINT) AS n_neg,
        |        CAST(sum(p_at * (2*(cum_neg - neg_at) + neg_at)) AS BIGINT)
        |          AS u2
        |      FROM c GROUP BY source)
        |SELECT source, n_pos, n_neg,
        |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0
        |    AND n_pos <= 4611686018427387 // greatest(n_neg, 1) THEN
        |    ((u2 * 1000) // (2 * n_pos * n_neg)) * 1000
        |    + (((u2 * 1000) % (2 * n_pos * n_neg)) * 1000)
        |      // (2 * n_pos * n_neg)
        |  END AS BIGINT) AS auc_micro
        |FROM a""".stripMargin,
    // decile confidence bins over the micro stopword-ratio score; mean
    // claimed confidence vs observed positive rate, both floored micros
    "q229_calibration_bins" ->
      """WITH d AS (SELECT source,
        |    (CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','of','and','to','in','a','is','that')))
        |      AS BIGINT) * 1000000)
        |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
        |      AS label
        |  FROM documents),
        |b AS (SELECT source,
        |    LEAST((score * 10) // 1000000, 9) AS bin, score, label
        |  FROM d),
        |g AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(score) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS conf_micro,
        |    (CAST(sum(label) AS BIGINT) * 1000000)
        |      // CAST(count(*) AS BIGINT) AS acc_micro
        |  FROM b GROUP BY source, bin)
        |SELECT source, bin, n, conf_micro, acc_micro,
        |  abs(conf_micro - acc_micro) AS gap_micro
        |FROM g""".stripMargin,
    // same count relation, same descending cumulative sweep, same
    // floored micro arithmetic (f1 from the already-floored P and R)
    "q224_pr_curve" ->
      """WITH d AS (SELECT source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','of','and','to','in','a','is','that')))
        |      AS BIGINT) AS score,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS label
        |  FROM documents),
        |g AS (SELECT source, score AS threshold,
        |        CAST(count(*) AS BIGINT) AS n_at,
        |        CAST(sum(label) AS BIGINT) AS p_at
        |      FROM d GROUP BY source, score),
        |c AS (SELECT source, threshold,
        |        CAST(sum(p_at) OVER (PARTITION BY source ORDER BY threshold DESC)
        |          AS BIGINT) AS tp,
        |        CAST(sum(n_at) OVER (PARTITION BY source ORDER BY threshold DESC)
        |          AS BIGINT) AS pp,
        |        CAST(sum(p_at) OVER (PARTITION BY source) AS BIGINT) AS n_pos
        |      FROM g),
        |m AS (SELECT *, CAST((tp * 1000000) // pp AS BIGINT) AS precision_micro,
        |        CAST(CASE WHEN n_pos > 0 THEN (tp * 1000000) // n_pos END
        |          AS BIGINT) AS recall_micro
        |      FROM c)
        |SELECT source, threshold, tp, pp, n_pos, precision_micro,
        |  recall_micro,
        |  CAST(CASE WHEN n_pos > 0 AND precision_micro + recall_micro > 0
        |       THEN (2 * precision_micro * recall_micro)
        |            // (precision_micro + recall_micro)
        |       WHEN n_pos > 0 THEN 0 END AS BIGINT) AS f1_micro
        |FROM m""".stripMargin,
    // same md5 span starts, same 3-token spread window, same island
    // merge, same sentinel numbering and sorted reassembly
    "q225_span_corruption" -> {
      val h = hexToLongSql(
        "md5('span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR))",
        1, 15)
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tk AS (SELECT doc_id, s.pos AS pos, s.tok AS tokn FROM
         |   (SELECT doc_id, unnest([{'pos': i - 1, 'tok': w[i]}
         |                           FOR i IN range(1, len(w) + 1)]) AS s
         |    FROM t) x),
         |st AS (SELECT doc_id, pos, tokn,
         |        CASE WHEN CAST($h AS BIGINT) % 100 < 10 THEN 1 ELSE 0 END
         |          AS s FROM tk),
         |mk AS (SELECT *, max(s) OVER (PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS m
         |       FROM st),
         |ns AS (SELECT *, CASE WHEN m AND NOT coalesce(
         |          lag(m) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
         |          THEN 1 ELSE 0 END AS new_span FROM mk),
         |sp AS (SELECT *, CAST(sum(new_span) OVER (PARTITION BY doc_id
         |          ORDER BY pos) AS BIGINT) AS span_id FROM ns),
         |pc AS (SELECT doc_id, pos, m, span_id,
         |        CASE WHEN NOT m THEN tokn
         |             WHEN new_span = 1 THEN
         |               '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>'
         |        END AS in_piece,
         |        CASE WHEN m AND new_span = 1 THEN
         |               '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>'
         |                 || ' ' || tokn
         |             WHEN m THEN tokn END AS tgt_piece
         |      FROM sp)
         |SELECT doc_id,
         |  COALESCE(array_to_string(list(in_piece ORDER BY pos)
         |    FILTER (WHERE in_piece IS NOT NULL), ' '), '') AS input_text,
         |  COALESCE(array_to_string(list(tgt_piece ORDER BY pos)
         |    FILTER (WHERE tgt_piece IS NOT NULL), ' '), '') AS target_text,
         |  CAST(max(span_id) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS masked_tokens
         |FROM pc GROUP BY doc_id""".stripMargin
    },
    // same (key, shard) md5 weights, same argmax with the same
    // (hrw desc, shard asc) tiebreak, shards 0..7 a prefix of 0..8
    "q226_rendezvous_shards" -> {
      val h = hexToLongSql(
        "md5('rv:' || CAST(doc_id AS VARCHAR) || ':' || CAST(shard AS VARCHAR))",
        1, 15)
      s"""WITH ids AS (SELECT DISTINCT doc_id FROM documents),
         |h AS (SELECT doc_id, s.shard AS shard, CAST($h AS BIGINT) AS hrw
         |      FROM ids CROSS JOIN (SELECT unnest(range(9)) AS shard) s),
         |r8 AS (SELECT doc_id, shard FROM (
         |        SELECT doc_id, shard, row_number() OVER (PARTITION BY doc_id
         |          ORDER BY hrw DESC, shard ASC) AS rn
         |        FROM h WHERE shard < 8) x WHERE rn = 1),
         |r9 AS (SELECT doc_id, shard AS shard9 FROM (
         |        SELECT doc_id, shard, row_number() OVER (PARTITION BY doc_id
         |          ORDER BY hrw DESC, shard ASC) AS rn
         |        FROM h) x WHERE rn = 1)
         |SELECT CAST(r8.shard AS INT) AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN r9.shard9 <> r8.shard THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_moved
         |FROM r8 JOIN r9 USING (doc_id) GROUP BY r8.shard""".stripMargin
    },
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice*l_discount*100) AS BIGINT) AS disc_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin,
    "q03_sql_pricing" -> sharedSql("q03_sql_pricing"),
    "q14_sql_join_agg" -> sharedSql("q14_sql_join_agg"),
    "q43_grouping_sets" -> sharedSql("q43_grouping_sets"),
    "q44_median" ->
      """SELECT o_orderpriority,
        |  quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS median_cents,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q10_join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q11_left_join_null_count" ->
      """SELECT o_orderkey, count(l_linenumber) AS big_lines
        |FROM orders LEFT JOIN
        |  (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity >= 45) li
        |  ON o_orderkey = li.l_orderkey
        |GROUP BY o_orderkey""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q13_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q20_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 2""".stripMargin,
    "q21_sort_limit" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q22_having" ->
      """SELECT o_custkey, count(o_orderkey) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING count(o_orderkey) > 12""".stripMargin,
    "q23_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q24_set_ops" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |   INTERSECT
        |   SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 5000)
        |) u""".stripMargin,
    "q25_merge_upsert" ->
      """WITH delta AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal+1000 AS c_acctbal,
        |         CAST(NULL AS VARCHAR) AS c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey+10000000, c_name, c_nationkey, 0.0, 'NEW'
        |  FROM customer WHERE c_custkey % 100 = 0)
        |SELECT c.c_custkey, c.c_name, c.c_nationkey,
        |  CASE WHEN d.c_custkey IS NOT NULL THEN d.c_acctbal
        |       ELSE c.c_acctbal END AS c_acctbal,
        |  COALESCE(d.c_mktsegment, c.c_mktsegment) AS c_mktsegment
        |FROM customer c LEFT JOIN delta d ON c.c_custkey = d.c_custkey
        |UNION ALL
        |SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment
        |FROM delta d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM customer)""".stripMargin,
    "q26_dedup_nulldistinct" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL
        |         ELSE CAST(c_nationkey AS VARCHAR) || '-' || c_mktsegment END AS k
        |  FROM customer)
        |SELECT c_custkey, k FROM (
        |  SELECT c_custkey, k,
        |    row_number() OVER (PARTITION BY k ORDER BY c_custkey) AS rn
        |  FROM t WHERE k IS NOT NULL) d
        |WHERE rn = 1
        |UNION ALL
        |SELECT c_custkey, k FROM t WHERE k IS NULL""".stripMargin,
    "q27_surrogate_keys" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name FROM nation
        |UNION ALL
        |SELECT (SELECT max(n_nationkey) FROM nation)
        |       + row_number() OVER (ORDER BY name) AS id, name
        |FROM (SELECT DISTINCT s_name AS name FROM supplier) s""".stripMargin,
    "q30_case_chain" ->
      """SELECT p_partkey,
        |  CASE WHEN p_type LIKE '%PROMO ANODIZED%' THEN 'promo-anodized'
        |       WHEN p_type LIKE '%PROMO%' THEN 'promo'
        |       WHEN p_type LIKE '%ECONOMY ANODIZED%' THEN 'economy-anodized'
        |       WHEN p_type LIKE '%ECONOMY%' THEN 'economy'
        |       WHEN p_type LIKE '%STANDARD%' THEN 'standard'
        |       WHEN p_type LIKE '%MEDIUM%' THEN 'medium'
        |       WHEN p_type LIKE '%SMALL%' THEN 'small'
        |       WHEN p_type LIKE '%LARGE%' THEN 'large'
        |       ELSE 'Unknown' END AS p_class
        |FROM part""".stripMargin,
    "q31_lookup_normalize" ->
      """SELECT c_custkey, COALESCE(v.norm, 'Other') AS norm_region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN (VALUES ('FRANCE','Western Europe'), ('GERMANY','Western Europe'),
        |                  ('JAPAN','East Asia'), ('CHINA','East Asia'))
        |  AS v(n_name, norm) USING (n_name)""".stripMargin,
    "q32_string_funcs" ->
      """SELECT p_partkey,
        |  CAST(length(trim(p_name)) AS INT) AS name_len,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CASE WHEN contains(p_name, ' ') THEN trim(split_part(p_name, ' ', 1))
        |       ELSE 'Unknown' END AS first_word,
        |  'brand:' || p_brand AS brand_tag,
        |  upper(p_brand) AS brand_uc
        |FROM part""".stripMargin,
    "q33_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_epoch,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q34_conditional_clean" ->
      """SELECT c_custkey,
        |  COALESCE(nullif(trim(c_mktsegment), ''), 'Unknown') AS segment,
        |  CASE WHEN c_acctbal < 0 THEN 'delinquent'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier
        |FROM customer""".stripMargin,
    "q40_audit_diff" ->
      """WITH newsnap AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 50 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 9000000, c_acctbal FROM customer WHERE c_custkey % 100 = 0)
        |SELECT 'customer' AS table_name,
        |  CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
        |       WHEN n.c_custkey IS NULL THEN 'DELETE'
        |       ELSE 'UPDATE' END AS operation,
        |  CAST(COALESCE(o.c_custkey, n.c_custkey) AS BIGINT) AS pk
        |FROM customer o FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.c_acctbal <> n.c_acctbal""".stripMargin,
    "q41_constraints_report" ->
      """SELECT 'check_acctbal_nonneg' AS constraint_name, CAST(count(*) FILTER (WHERE NOT (c_acctbal >= 0)) AS BIGINT) AS violations FROM customer
        |UNION ALL
        |SELECT 'not_null_c_mktsegment', CAST(count(*) FILTER (WHERE c_mktsegment IS NULL) AS BIGINT) FROM customer
        |UNION ALL
        |SELECT 'check_name_nonempty', CAST(count(*) FILTER (WHERE NOT (length(trim(c_name)) > 1)) AS BIGINT) FROM customer
        |UNION ALL
        |SELECT 'unique_orders_custkey', CAST(COALESCE(sum(c - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS c FROM orders WHERE o_custkey IS NOT NULL
        |      GROUP BY o_custkey HAVING count(*) > 1) d
        |UNION ALL
        |SELECT 'fk_orders_positive_customer', CAST(count(*) AS BIGINT) FROM orders
        |WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 0)""".stripMargin,

    "q28_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q29_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q35_regex_funcs" ->
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS prio_num,
        |  regexp_replace(o_orderpriority, '[^A-Z]', '', 'g') AS prio_word
        |FROM orders""".stripMargin,
    "q36_array_funcs" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
        |  list_contains(string_split(p_type, ' '), 'BRUSHED') AS is_brushed,
        |  array_to_string(list_sort(string_split(p_type, ' ')), ',') AS sorted_words
        |FROM part""".stripMargin,
    "q37_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(epoch(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)) AS BIGINT) AS plus3m_epoch,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(isodow(o_orderdate) AS INT) AS isodow
        |FROM orders""".stripMargin,
    "q38_window_analytics" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT)
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
        |  lag(CAST(round(l_extendedprice*100) AS BIGINT), 1) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT)
        |  ) AS prev_cents
        |FROM lineitem""".stripMargin,
    "q39_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q47_scalar_subquery" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE CAST(round(o_totalprice*100) AS BIGINT) * (SELECT count(*) FROM orders)
        |  > (SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) FROM orders)""".stripMargin,
    "q42_pivot" ->
      """SELECT l_linestatus,
        |  sum(l_quantity) FILTER (WHERE l_returnflag = 'A') AS qty_a,
        |  sum(l_quantity) FILTER (WHERE l_returnflag = 'N') AS qty_n,
        |  sum(l_quantity) FILTER (WHERE l_returnflag = 'R') AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q50_dedup_exact" ->
      """SELECT fp, min(doc_id) AS representative, count(*) AS dup_count
        |FROM (SELECT doc_id,
        |        md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS fp
        |      FROM documents) t
        |GROUP BY fp HAVING count(*) > 1""".stripMargin,
    "q51_dedup_minhash_lsh" -> minhashOracleSql,
    "q52_dedup_ngram_jaccard" -> oracleJaccardPairs(0.5),
    // every co-shingled ORDERED pair, exact |A∩B|·1e6 div |A| (the
    // all-pairs mirror of the prefix-filtered operator)
    "q230_containment_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id AS id,
        |         unnest(list_distinct([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
        |                               FOR i IN range(1, greatest(len(w.w)-2, 0)+1)])) AS shingle
        |       FROM w),
        |sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
        |common AS (SELECT a.id AS id_a, b.id AS id_b,
        |             CAST(count(*) AS BIGINT) AS n_common
        |           FROM sh a JOIN sh b ON a.shingle = b.shingle
        |             AND a.id <> b.id
        |           GROUP BY a.id, b.id)
        |SELECT id_a, id_b, (n_common * 1000000) // za.n AS cont_micro
        |FROM common JOIN sz za ON za.id = id_a
        |WHERE (n_common * 1000000) // za.n >= 800000""".stripMargin,
    "q53_dedup_simhash" -> simhashOracleSql,
    "q54_ann_brute_topk" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |           FROM embeddings),
        |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |             list_dot_product(q.v, c.v) /
        |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
        |           FROM e q JOIN e c ON q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM scored) r
        |WHERE rank <= 10""".stripMargin,
    "q55_embedding_neardup" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35""".stripMargin,
    "q58_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_len,
        |  CAST(length(text) AS DOUBLE) / greatest(len(string_split(text, ' ')), 1) AS avg_token_len,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / greatest(len(string_split(text, ' ')), 1) AS uniq_token_ratio
        |FROM documents""".stripMargin,
    "q59_langid" -> langidOracleSql,
    "q60_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS prefix_fp
        |FROM documents""".stripMargin,
    "q61_events_hourly" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q62_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |           FROM events),
        |flagged AS (SELECT user_id, event_id, ts_sec,
        |  CASE WHEN ts_sec - lag(ts_sec) OVER w <= 1800 THEN 0 ELSE 1 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |sess AS (SELECT user_id, ts_sec,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  min(ts_sec) AS start_sec,
        |  max(ts_sec) - min(ts_sec) AS duration_sec
        |FROM sess GROUP BY user_id, session_id""".stripMargin,
    "q63_json_props" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q66_curation_pipeline" ->
      """WITH gated AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / greatest(len(string_split(text, ' ')), 1) AS uniq_ratio,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20
        |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / greatest(len(string_split(text, ' ')), 1) >= 0.2),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM gated) g WHERE rn = 1)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM deduped GROUP BY lang""".stripMargin,
    "q64_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(unhex(md5(text))) AS INT) AS n_bytes,
        |  substring(hex(unhex(md5(text))), 1, 8) AS hex8
        |FROM documents""".stripMargin,
    // components = min reachable doc_id over the minhash pair graph: the
    // recursive CTE floods labels along (symmetric) edges; UNION dedup
    // guarantees termination
    // the incremental label store answers exactly the bulk flood (q68's
    // SQL): the piecewise edge sets cover the bulk pair set because LSH
    // banding is per-document
    "q131_incremental_components" ->
      s"""WITH RECURSIVE mh AS (
         |  SELECT id_a, id_b FROM ($minhashOracleSql) mhp
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh
         |),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id
         |)
         |SELECT id AS doc_id, min(m) AS component FROM r GROUP BY id""".stripMargin,
    // delete-resolve mirror: full-graph components (a deleted bridge
    // still merges; its id may still label the cluster), membership
    // restricted to the survivors
    "q162_label_delete" ->
      s"""WITH RECURSIVE mh AS (
         |  SELECT id_a, id_b FROM ($minhashOracleSql) mhp
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh
         |),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id
         |)
         |SELECT id AS doc_id, min(m) AS component FROM r
         |WHERE id % 9 <> 4 GROUP BY id""".stripMargin,
    // the streaming lifecycle (q140) folds the same drops through the
    // same min-id flood, so it answers the identical bulk SQL
    "q140_label_stream_ingest" ->
      s"""WITH RECURSIVE mh AS (
         |  SELECT id_a, id_b FROM ($minhashOracleSql) mhp
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh
         |),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id
         |)
         |SELECT id AS doc_id, min(m) AS component FROM r GROUP BY id""".stripMargin,
    "q68_dedup_components" ->
      s"""WITH RECURSIVE mh AS (
         |  SELECT id_a, id_b FROM ($minhashOracleSql) mhp
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh
         |),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM documents
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id
         |)
         |SELECT id AS doc_id, min(m) AS component FROM r GROUP BY id""".stripMargin,
    "q73_events_sliding" ->
      """WITH e AS (SELECT event_type,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |           FROM events),
        |w AS (SELECT event_type,
        |        (ts_sec - ts_sec % 900) - k * 900 AS w_start
        |      FROM e CROSS JOIN (SELECT unnest(range(4)) AS k) ks)
        |SELECT w_start, event_type, count(*) AS n_events
        |FROM w GROUP BY w_start, event_type""".stripMargin,
    "q74_range_window" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |           FROM events
        |           WHERE event_type IN ('error', 'click')),
        |r AS (SELECT event_id, user_id, event_type, ts_sec,
        |        sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
        |          PARTITION BY user_id ORDER BY ts_sec
        |          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS clicks_10m
        |      FROM e)
        |SELECT event_id, user_id, ts_sec, CAST(clicks_10m AS BIGINT) AS clicks_10m
        |FROM r WHERE event_type = 'error'""".stripMargin,
    // gate → minhash pairs over survivors → component flood → keep
    // representatives → per-language stats (the q66 shape with fuzzy dedup)
    "q72_curation_neardup" -> {
      val gatePred =
        """len(string_split(text, ' ')) >= 20
          |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          |      / greatest(len(string_split(text, ' ')), 1) >= 0.2""".stripMargin
      val gatedSrc = s"(SELECT doc_id, text FROM documents WHERE $gatePred) gsrc"
      s"""WITH RECURSIVE gated AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE $gatePred),
         |mh AS (SELECT id_a, id_b FROM (${minhashPairsSqlFrom(gatedSrc)}) mhp),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM gated
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(m) AS component FROM r GROUP BY id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM gated JOIN comp ON gated.doc_id = comp.id
         |WHERE comp.id = comp.component
         |GROUP BY lang""".stripMargin
    },
    // the salted two-phase agg must equal the PLAIN group-by — that
    // equality IS the correctness property of salting
    "q70_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q71_quality_gate" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tok,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / greatest(len(string_split(text, ' ')), 1) AS uniq_ratio,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) AS alpha_ratio,
        |    CAST(list_sum(list_transform(string_split(text, ' '),
        |      w -> greatest(1, CAST(ceil(length(w)/4.0) AS BIGINT)))) AS BIGINT) AS bpe_tokens
        |  FROM documents),
        |s AS (SELECT doc_id, bpe_tokens,
        |        round((least(n_tok/50.0, 1.0) + uniq_ratio + alpha_ratio)/3, 6) AS quality_score
        |      FROM m)
        |SELECT doc_id, quality_score, bpe_tokens,
        |  quality_score >= 0.5 AS is_kept
        |FROM s""".stripMargin,
    // mirror of the union+window as-of formulation; right rows sort
    // before left at equal ts (<= semantics), last struct carried
    // forward. ts IS NOT NULL encodes joinAsOf's null-timestamp
    // exclusion (fixture events have none; the contract must still be
    // mirrored or a null ts would match under DuckDB's NULLS LAST)
    "q69_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |             CAST(round(value*100) AS BIGINT) AS value_cents
        |           FROM events WHERE ts IS NOT NULL),
        |l AS (SELECT event_id, user_id, ts_sec, value_cents, 1 AS side,
        |        CAST(NULL AS BIGINT) AS tb,
        |        CAST(NULL AS STRUCT(event_id BIGINT, value_cents BIGINT)) AS p
        |      FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT CAST(NULL AS BIGINT) AS event_id, user_id, ts_sec,
        |        CAST(NULL AS BIGINT) AS value_cents, 0 AS side,
        |        event_id AS tb,
        |        {'event_id': event_id, 'value_cents': value_cents} AS p
        |      FROM e WHERE event_type = 'click'),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |w AS (SELECT *, last_value(p IGNORE NULLS) OVER (
        |        PARTITION BY user_id ORDER BY ts_sec, side, tb
        |        ROWS UNBOUNDED PRECEDING) AS lastp
        |      FROM u)
        |SELECT event_id, user_id, ts_sec, value_cents,
        |  lastp.event_id AS asof_event_id,
        |  lastp.value_cents AS asof_value_cents
        |FROM w WHERE side = 1""".stripMargin,
    "q75_stratified_sample" -> {
      val h = hexToLongSql("md5('smp:' || CAST(doc_id AS VARCHAR))", 1, 15)
      s"""WITH h AS (SELECT doc_id, lang,
         |             CAST(($h) % 100 AS INT) AS bucket
         |           FROM documents)
         |SELECT doc_id, lang, bucket FROM h
         |WHERE bucket < CASE WHEN lang = 'en' THEN 5 ELSE 20 END""".stripMargin
    },
    "q76_tfidf_topterms" ->
      """WITH tok AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT lang, token, count(*) AS tf FROM tok GROUP BY lang, token),
        |dfreq AS (SELECT token, count(*) AS df FROM
        |            (SELECT DISTINCT doc_id, token FROM tok) d GROUP BY token),
        |scored AS (SELECT tf.lang, tf.token, tf.tf, dfreq.df,
        |             (tf.tf * 1000000) // dfreq.df AS score
        |           FROM tf JOIN dfreq ON tf.token = dfreq.token),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY lang
        |             ORDER BY score DESC, token ASC) AS rn
        |           FROM scored)
        |SELECT lang, token, tf, df, score, CAST(rn AS INT) AS rn
        |FROM ranked WHERE rn <= 10""".stripMargin,
    "q77_vocab_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents)
        |SELECT token, count(*) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY token
        |ORDER BY n_occ DESC, token ASC LIMIT 100""".stripMargin,
    "q78_length_histogram" ->
      """WITH d AS (SELECT least(CAST(len(string_split(text, ' ')) AS BIGINT) // 50,
        |                       19) AS bucket,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |agg AS (SELECT bucket, count(*) AS n_docs,
        |          CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |        FROM d GROUP BY bucket)
        |SELECT bucket, n_docs, sum_tokens,
        |  CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS share
        |FROM agg""".stripMargin,
    "q79_embedding_dim_stats" ->
      """WITH e AS (SELECT list_transform(embedding,
        |             x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |           FROM embeddings),
        |x AS (SELECT unnest([{'pos': i-1, 'x': v[i]} FOR i IN range(1, len(v)+1)]) AS s
        |      FROM e)
        |SELECT CAST(s.pos AS INT) AS pos, count(*) AS n,
        |  CAST(sum(s.x) AS BIGINT) AS sum_milli,
        |  min(s.x) AS min_milli, max(s.x) AS max_milli,
        |  CAST(sum(s.x) AS DOUBLE) / count(*) AS mean_milli
        |FROM x GROUP BY s.pos""".stripMargin,
    // NOT EXISTS, not NOT IN: a single NULL fp in the corpus would
    // NULL-poison NOT IN to an empty result, while Spark's left_anti
    // keeps null-keyed probes — NOT EXISTS matches anti-join semantics
    "q80_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, lang,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |           FROM documents)
        |SELECT doc_id, lang, fp FROM d
        |WHERE doc_id % 10 = 0
        |  AND NOT EXISTS (SELECT 1 FROM d d2
        |                  WHERE d2.doc_id % 10 <> 0 AND d2.fp = d.fp)""".stripMargin,
    "q81_sample_exact_k" ->
      """WITH h AS (SELECT doc_id, lang,
        |             md5('rk:' || CAST(doc_id AS VARCHAR)) AS hkey
        |           FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY hkey ASC, doc_id ASC) AS rk
        |      FROM h)
        |SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM r WHERE rk <= 30""".stripMargin,
    "q82_prefix_clusters" ->
      """WITH p AS (SELECT doc_id,
        |             md5(array_to_string(string_split(text,' ')[1:8], ' ')) AS prefix_fp
        |           FROM documents)
        |SELECT prefix_fp, count(*) AS n_docs,
        |  min(doc_id) AS representative
        |FROM p GROUP BY prefix_fp HAVING count(*) > 1""".stripMargin,
    "q83_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id AS id,
        |         unnest(list_distinct([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
        |                               FOR i IN range(1, greatest(len(w.w)-2, 0)+1)])) AS shingle
        |       FROM w),
        |bad AS (SELECT DISTINCT c.id FROM sh c
        |        JOIN sh b ON b.shingle = c.shingle AND b.id % 97 = 0
        |        WHERE c.id % 97 <> 0)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id % 97 <> 0
        |  AND d.doc_id NOT IN (SELECT id FROM bad)""".stripMargin,
    "q84_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT lang,
         |             ${hexToLongSql("md5(text)", 1, 15)} AS h
         |           FROM documents),
         |r AS (SELECT lang, h,
         |        row_number() OVER (PARTITION BY lang ORDER BY h ASC) AS rk
         |      FROM h)
         |SELECT lang, count(*) AS n_seen, max(h) AS kth_hash,
         |  CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
         |       ELSE 15.0 * 1152921504606846976 / CAST(max(h) AS DOUBLE)
         |  END AS est_distinct
         |FROM r WHERE rk <= 16 GROUP BY lang""".stripMargin,
    "q85_zorder_key" ->
      s"""SELECT event_id, user_id % 2048 AS xb,
         |  CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS yb,
         |  ${zOrder2Sql("(user_id % 2048)", "(hour(ts) * 60 + minute(ts))", 11)} AS z
         |FROM events
         |ORDER BY z DESC, event_id ASC LIMIT 100""".stripMargin,
    "q86_pack_shards" ->
      """WITH d AS (SELECT lang, doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |c AS (SELECT lang, doc_id, tok,
        |        sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM d)
        |SELECT lang, CAST((cum - tok) // 512 AS BIGINT) AS shard,
        |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_sum,
        |  CAST(sum(tok) AS DOUBLE) / 512 AS fill
        |FROM c GROUP BY lang, (cum - tok) // 512""".stripMargin,
    "q87_doc_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS st FROM w)
        |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |  CAST(least(32, len(toks) - st) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[st+1 : st+32], ' ')) AS chunk_fp
        |FROM s""".stripMargin,
    "q88_corpus_mix" ->
      """WITH e AS (SELECT doc_id, lang,
        |             CASE WHEN lang = 'en' THEN 2 WHEN lang = 'zh' THEN 3
        |                  WHEN lang = 'de' THEN 0 ELSE 1 END AS n
        |           FROM documents),
        |x AS (SELECT doc_id, lang, unnest(range(1, n + 1)) AS epoch
        |      FROM e WHERE n >= 1)
        |SELECT doc_id, lang, CAST(epoch AS INT) AS epoch,
        |  md5('mix:' || lang || ':' || CAST(epoch AS VARCHAR)
        |      || ':' || CAST(doc_id AS VARCHAR)) AS mix_key
        |FROM x""".stripMargin,
    "q89_repetition_stats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id,
        |        unnest([w.w[i] || ' ' || w.w[i+1]
        |                FOR i IN range(1, greatest(len(w.w)-1, 0)+1)]) AS gram
        |      FROM w),
        |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_gram_frac,
        |  CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_gram_frac,
        |  (CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) > 0.2
        |   OR CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) > 0.6)
        |    AS is_repetitive
        |FROM c GROUP BY doc_id""".stripMargin,
    "q90_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g0 AS (SELECT doc_id,
        |         unnest([array_to_string(w.w[i:i+7], ' ')
        |                 FOR i IN range(1, greatest(len(w.w)-7, 0)+1)]) AS gram
        |       FROM w),
        |g AS (SELECT doc_id, md5(gram) AS fp FROM g0),
        |f AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM g GROUP BY fp)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS dup_frac,
        |  (CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |   >= 0.3) AS is_dup_heavy
        |FROM g JOIN f USING (fp) GROUP BY g.doc_id""".stripMargin,
    "q91_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |             list_transform(embedding,
        |               x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |           FROM embeddings),
        |x0 AS (SELECT vec_id, label,
        |         unnest([{'dim': i-1, 'm': v[i]} FOR i IN range(1, len(v)+1)]) AS s
        |       FROM e),
        |x AS (SELECT vec_id, label, s.dim AS dim, s.m AS m FROM x0),
        |cent AS (SELECT label, dim,
        |           CAST(floor(CAST(sum(m) AS DOUBLE) / count(*)) AS BIGINT) AS c
        |         FROM x GROUP BY label, dim),
        |d AS (SELECT vec_id, label,
        |        CAST(sum((m - c) * (m - c)) AS BIGINT) AS dist2_milli
        |      FROM x JOIN cent USING (label, dim) GROUP BY vec_id, label),
        |r AS (SELECT label, vec_id, dist2_milli,
        |        row_number() OVER (PARTITION BY label
        |          ORDER BY dist2_milli DESC, vec_id ASC) AS rk
        |      FROM d)
        |SELECT label, vec_id, dist2_milli, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 5""".stripMargin,
    "q92_mix_weights" ->
      """WITH g AS (SELECT lang, source, count(*) AS n_docs,
        |             CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |                  AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY lang, source)
        |SELECT lang, source, n_docs, n_tokens,
        |  CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE)
        |    AS token_share,
        |  sqrt(CAST(n_tokens AS DOUBLE)) / sqrt(CAST(sum(n_tokens) OVER () AS DOUBLE))
        |    AS temp_weight
        |FROM g""".stripMargin,
    // Stage k's first-qualifying time is NULL-gated on stage k-1: a CASE
    // condition over a NULL t_{k-1} is NULL → skipped by min(), exactly
    // the Spark side's isNotNull && ts >= prev gate.
    "q93_event_funnel" ->
      """WITH s0 AS (SELECT user_id,
        |              min(CASE WHEN event_type = 'view' THEN ts END) AS t0
        |            FROM events GROUP BY user_id),
        |s1 AS (SELECT s0.user_id, t0,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts >= t0
        |             THEN e.ts END) AS t1
        |       FROM s0 JOIN events e ON e.user_id = s0.user_id
        |       GROUP BY s0.user_id, t0),
        |s2 AS (SELECT s1.user_id, t0, t1,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= t1
        |             THEN e.ts END) AS t2
        |       FROM s1 JOIN events e ON e.user_id = s1.user_id
        |       GROUP BY s1.user_id, t0, t1)
        |SELECT 1 AS stage_idx, 'view' AS stage, count(t0) AS n_users FROM s2
        |UNION ALL SELECT 2, 'click', count(t1) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(t2) FROM s2""".stripMargin,
    // mirrors crossGroupDupMatrix's default maxClusterSize = 10000: the
    // pair join excludes oversized clusters in BOTH engines, so the two
    // sides agree even at a scale where the cap binds
    "q94_dup_source_matrix" ->
      """WITH d AS (SELECT doc_id, source,
        |             md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
        |           FROM documents),
        |small AS (SELECT fp FROM d GROUP BY fp HAVING count(*) <= 10000)
        |SELECT least(a.source, b.source) AS grp_a,
        |  greatest(a.source, b.source) AS grp_b, count(*) AS n_pairs
        |FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |WHERE a.fp IN (SELECT fp FROM small)
        |GROUP BY 1, 2""".stripMargin,
    "q95_length_strata" ->
      """WITH d AS (SELECT lang, doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |t AS (SELECT lang, tok,
        |        ntile(4) OVER (PARTITION BY lang ORDER BY tok ASC, doc_id ASC)
        |          AS tile
        |      FROM d)
        |SELECT lang, CAST(tile AS INT) AS tile, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS tok_sum,
        |  min(tok) AS tok_min, max(tok) AS tok_max
        |FROM t GROUP BY lang, tile""".stripMargin,
    "q96_token_fertility" ->
      """WITH w AS (SELECT lang, doc_id,
        |             unnest(string_split(text, ' ')) AS wd
        |           FROM documents),
        |p AS (SELECT lang, doc_id, count(*) AS ws,
        |        CAST(sum(greatest(1, CAST(ceil(length(wd) / 4) AS BIGINT)))
        |             AS BIGINT) AS bpe
        |      FROM w GROUP BY lang, doc_id)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) AS fertility
        |FROM p GROUP BY lang""".stripMargin,
    "q97_source_hhi" ->
      """WITH g AS (SELECT lang, source, count(*) AS c
        |           FROM documents GROUP BY lang, source)
        |SELECT lang, count(*) AS n_items, CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(sum(c * c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE) AS hhi
        |FROM g GROUP BY lang""".stripMargin,
    "q98_length_quantiles" ->
      """WITH d AS (SELECT lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  quantile_cont(tok, 0.1) AS p10,
        |  quantile_cont(tok, 0.5) AS p50,
        |  quantile_cont(tok, 0.9) AS p90
        |FROM d GROUP BY lang""".stripMargin,
    // HUGEINT sums/products keep the moments exact; the ONLY lossy steps
    // are the final casts to DOUBLE and the same sqrt/divide tree Spark
    // evaluates — each IEEE correctly-rounded, so bit-identical.
    "q99_value_hour_corr" ->
      """WITH e AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS x,
        |             CAST(hour(ts) AS BIGINT) AS y
        |           FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |      FROM e GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson
        |FROM m""".stripMargin,
    // full-corpus minhash pairs restricted to CROSS pairs (exactly one
    // side in the new batch) — banding is per-doc, so the restriction
    // equals the two-sided bucket join the Spark operator plans
    "q100_incremental_minhash" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashOracleSql) p
         |WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)""".stripMargin,
    // the stored-index probe must return exactly the in-plan q100 pairs
    "q101_band_index_probe" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashOracleSql) p
         |WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)""".stripMargin,
    // stub-decoder mirror: payload = unhex(repeat(md5(text),4)); the
    // decoder md5s the payload and derives width/height/features from
    // its bytes — hex-nibble arithmetic keeps it engine-portable, and
    // the float÷255 quantization is double-rounding-safe for all 256
    // byte values (checked exhaustively)
    "q102_multimodal_decode" -> {
      def nib(pos: Int) =
        s"(strpos('0123456789abcdef', substring(h, $pos, 1)) - 1)"
      def byteAt(i: Int) = s"(${nib(2 * i + 1)} * 16 + ${nib(2 * i + 2)})"
      // one SCALAR row per feature index (Spark side posexplodes) — the
      // CASE over the generated per-index byte expressions mirrors
      // transform+posexplode without a DuckDB list column in the output
      // (the driver's pandas comparator cannot sort/hash arrays)
      val fCase = (0 until 8).map(i =>
        s"WHEN $i THEN CAST(round(CAST(CAST(${byteAt(i)} / 255.0 AS FLOAT) AS DOUBLE) * 1000) AS BIGINT)")
        .mkString("CASE f_idx ", " ", " END")
      s"""WITH m AS (SELECT doc_id AS media_id,
         |             repeat(md5(text), 2) AS payload
         |           FROM documents),
         |d AS (SELECT media_id, payload, md5(payload) AS h FROM m)
         |SELECT media_id,
         |  CAST(1 + ${byteAt(0)} % 64 AS INT) AS width,
         |  CAST(1 + ${byteAt(1)} % 64 AS INT) AS height,
         |  CAST(octet_length(CAST(payload AS BLOB)) AS INT) AS n_bytes,
         |  CAST(f_idx AS INT) AS f_idx,
         |  $fCase AS f_milli
         |FROM d CROSS JOIN (SELECT unnest(range(8)) AS f_idx) idx""".stripMargin
    },
    // the salted join must be INVISIBLE in the result: oracle = plain join
    "q103_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    // RE2 (DuckDB) and Java regex agree on this pattern subset (classes,
    // bounded repetition, \b — no lookaround/backrefs); 'g' matches
    // Spark's always-global regexp_replace
    "q104_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id, lang,
        |    text ||
        |    (CASE WHEN doc_id % 7 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN ' call 555-010-0199 now' ELSE '' END) ||
        |    (CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.42.7 today' ELSE '' END) AS t
        |  FROM documents),
        |c AS (
        |  SELECT lang,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
        |    len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS np,
        |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
        |    length(regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS rl
        |  FROM p)
        |SELECT lang, CAST(sum(ne) AS BIGINT) AS emails,
        |  CAST(sum(np) AS BIGINT) AS phones, CAST(sum(ni) AS BIGINT) AS ips,
        |  count(*) FILTER (ne + np + ni > 0) AS docs_with_pii,
        |  CAST(sum(rl) AS BIGINT) AS redacted_chars
        |FROM c GROUP BY lang""".stripMargin,
    // keep-best = rank per recursive-CTE component by (n_tokens desc, id)
    "q105_dedup_keep_best" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |mh AS (SELECT id_a, id_b FROM ($minhashOracleSql) mhp),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM d
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(m) AS component FROM r GROUP BY id),
         |ranked AS (
         |  SELECT d.lang, d.n_tokens,
         |    row_number() OVER (PARTITION BY comp.component
         |      ORDER BY d.n_tokens DESC, d.doc_id ASC) AS rk
         |  FROM d JOIN comp ON d.doc_id = comp.id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM ranked WHERE rk = 1 GROUP BY lang""".stripMargin,
    "q107_corpus_split" -> {
      val h = hexToLongSql("md5('split:' || CAST(doc_id AS VARCHAR))", 1, 15)
      s"""WITH b AS (SELECT lang,
         |             CAST(($h) % 100 AS INT) AS bucket,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         |           FROM documents)
         |SELECT lang,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
         |FROM b GROUP BY 1, 2""".stripMargin
    },
    // q107's bucket arithmetic applied to the recursive-CTE component id
    "q108_leakage_safe_split" -> {
      val h = hexToLongSql("md5('split:' || CAST(component AS VARCHAR))", 1, 15)
      s"""WITH RECURSIVE d AS (SELECT doc_id, lang FROM documents),
         |mh AS (SELECT id_a, id_b FROM ($minhashOracleSql) mhp),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM mh
         |  UNION
         |  SELECT id_b AS src, id_a AS dst FROM mh),
         |r AS (
         |  SELECT doc_id AS id, doc_id AS m FROM d
         |  UNION
         |  SELECT e.dst AS id, r.m FROM r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id, min(m) AS component FROM r GROUP BY id),
         |b AS (SELECT d.lang, CAST(($h) % 100 AS INT) AS bucket
         |      FROM d JOIN comp ON d.doc_id = comp.id)
         |SELECT lang,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs
         |FROM b GROUP BY 1, 2""".stripMargin
    },
    // // floors, Spark long-div truncates — equal for positives
    "q109_rare_token_gate" ->
      """WITH tok AS (SELECT doc_id, lang,
        |               unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT tok, count(*) AS ctf FROM tok GROUP BY tok)
        |SELECT doc_id, lang, count(*) AS n_tokens,
        |  CAST(sum(ctf) AS BIGINT) AS sum_ctf,
        |  CAST(CAST(sum(ctf) AS BIGINT) * 1000 // count(*) AS BIGINT) AS mean_ctf_milli
        |FROM tok JOIN tf USING (tok)
        |GROUP BY doc_id, lang""".stripMargin,
    // batch mirror of the STREAMING gate+dedup+agg: gate on normalized
    // token stats, dedup per fingerprint (all per-fp stats are equal, so
    // the representative choice is invisible), bucket by token count
    "q110_stream_curate" ->
      """WITH n AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |           FROM documents),
        |t AS (SELECT md5(norm) AS fp,
        |        CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
        |        CAST(len(list_distinct(string_split(norm, ' '))) AS DOUBLE)
        |          / greatest(len(string_split(norm, ' ')), 1) AS uniq_ratio
        |      FROM n),
        |dd AS (SELECT fp, min(n_tokens) AS n_tokens
        |       FROM t WHERE n_tokens >= 20 AND uniq_ratio >= 0.2
        |       GROUP BY fp)
        |SELECT CAST(n_tokens // 50 AS BIGINT) AS tok_bucket,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM dd GROUP BY 1""".stripMargin,
    // q104's planted-PII corpus through the REGISTERED SQL functions;
    // pii_count = emails + phones + ips in one scan
    "q111_sql_pii_registry" ->
      """WITH p AS (
        |  SELECT lang,
        |    text ||
        |    (CASE WHEN doc_id % 7 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN ' call 555-010-0199 now' ELSE '' END) ||
        |    (CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.42.7 today' ELSE '' END) AS t
        |  FROM documents)
        |SELECT lang,
        |  CAST(sum(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
        |    + len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_pii,
        |  CAST(sum(length(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))) AS BIGINT) AS redacted_chars,
        |  count(*) AS n_docs
        |FROM p GROUP BY lang""".stripMargin,
    // banding is per-doc, so each probe equals the full-corpus pair set
    // restricted to its sides: probe1 = drop1 × corpus (neither side
    // drop2), probe2 = drop2 × (corpus ∪ drop1) — exactly one side in
    // the probing drop either way; the branches are disjoint (probe1
    // pairs contain no drop2 member)
    "q112_band_index_append" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashOracleSql) p
         |WHERE ((id_a % 10 = 0) <> (id_b % 10 = 0)
         |        AND id_a % 10 <> 5 AND id_b % 10 <> 5)
         |   OR ((id_a % 10 = 5) <> (id_b % 10 = 5))""".stripMargin,
    // delete-probe mirror: cross pairs (one side the drop) whose
    // CORPUS side survived the delete — a drop doc with % 7 = 3 is
    // untouched (only corpus ids were deleted)
    "q160_band_delete_probe" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashOracleSql) p
         |WHERE ((id_a % 10 = 0) <> (id_b % 10 = 0))
         |  AND NOT (id_a % 10 <> 0 AND id_a % 7 = 3)
         |  AND NOT (id_b % 10 <> 0 AND id_b % 7 = 3)""".stripMargin,
    // robust-outlier mirror: same interpolating medians, same MAD, same
    // 2-MAD cut
    "q138_robust_outliers" ->
      """WITH d AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |med AS (SELECT source, quantile_cont(tok, 0.5) AS med FROM d GROUP BY source),
        |mad AS (SELECT d.source,
        |          quantile_cont(abs(d.tok - med.med), 0.5) AS mad,
        |          any_value(med.med) AS med
        |        FROM d JOIN med ON med.source = d.source
        |        GROUP BY d.source)
        |SELECT d.doc_id, d.source, d.tok, mad.med, mad.mad
        |FROM d JOIN mad ON mad.source = d.source
        |WHERE abs(d.tok - mad.med) > 2 * mad.mad""".stripMargin,
    // budget-draw mirror: same md5 order, same running token sum
    "q137_token_budget_mix" -> {
      val h = hexToLongSql("md5('mix:' || CAST(doc_id AS VARCHAR))", 1, 15)
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         |             CAST($h AS BIGINT) % 1000000 AS h
         |           FROM documents),
         |c AS (SELECT doc_id, source, tok,
         |        CAST(sum(tok) OVER (PARTITION BY source
         |          ORDER BY h ASC, doc_id ASC
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
         |      FROM d)
         |SELECT doc_id, source, tok, cum_tok FROM c WHERE cum_tok <= 800""".stripMargin
    },
    // dup-span mirror: same 8-gram df, same coverage expansion, same
    // ordered rebuild
    "q135_strip_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |toks AS (SELECT doc_id, s.pos, s.tok FROM (
        |    SELECT doc_id, unnest([{'pos': i-1, 'tok': w.w[i]}
        |                           FOR i IN range(1, len(w.w)+1)]) AS s FROM w) t),
        |grams AS (SELECT doc_id, g.gpos, g.gram FROM (
        |    SELECT doc_id,
        |      unnest([{'gpos': i-1,
        |               'gram': array_to_string(list_slice(w.w, i, i+7), ' ')}
        |              FOR i IN range(1, greatest(len(w.w)-7, 0)+1)]) AS g FROM w) t),
        |dup AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM grams) d
        |        GROUP BY gram HAVING count(*) > 1),
        |covered AS (SELECT DISTINCT doc_id, gpos + k.k AS pos
        |            FROM grams JOIN dup USING (gram)
        |            CROSS JOIN (SELECT unnest(range(8)) AS k) k),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
        |         WHERE NOT EXISTS (SELECT 1 FROM covered c
        |                           WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |          string_agg(tok, ' ' ORDER BY pos) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(reb.cleaned, '') AS cleaned
        |FROM w LEFT JOIN reb ON reb.doc_id = w.doc_id""".stripMargin,
    // count-min mirror: identical md5 row-hashes, cells, and min-over-
    // rows estimate
    "q132_countmin_tokens" -> cmOracleSql,
    // the streamed cells sum to the full-corpus sketch (seed ∪ drops =
    // every document; count-min cells merge by addition) — same mirror
    "q220_cm_stream" -> cmOracleSql,
    // streamed-state mirror: corpus ∪ drops = every document, so the
    // merged-partition quantiles equal q125's per-lang arithmetic
    "q130_sketch_stream" ->
      """WITH d AS (SELECT lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |b AS (SELECT lang, CAST(length(bin(tok)) AS INT) AS bucket FROM d),
        |sk AS (SELECT lang, bucket, count(*) AS n FROM b GROUP BY lang, bucket),
        |c AS (SELECT lang, bucket, n,
        |        CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket) AS BIGINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS total
        |      FROM sk),
        |est AS (SELECT lang, cum, total,
        |          (CAST(1 AS BIGINT) << bucket) - 1 AS est FROM c)
        |SELECT lang, max(total) AS n_rows,
        |  min(CASE WHEN cum >= (1*total + 9)//10 THEN est END) AS p10_est,
        |  min(CASE WHEN cum >= (1*total + 1)//2 THEN est END) AS p50_est,
        |  min(CASE WHEN cum >= (9*total + 9)//10 THEN est END) AS p90_est
        |FROM est GROUP BY lang""".stripMargin,
    // weighted-sample mirror: identical md5 micro-uniform and weight
    "q128_weighted_sample" -> {
      val h = hexToLongSql("md5('wsmp:' || CAST(doc_id AS VARCHAR))", 1, 15)
      s"""WITH d AS (SELECT doc_id, lang,
         |             least(1000000, CAST(len(string_split(text, ' ')) AS BIGINT) * 2000) AS w_micro,
         |             CAST($h AS BIGINT) % 1000000 AS u_micro
         |           FROM documents)
         |SELECT doc_id, lang, w_micro FROM d WHERE u_micro < w_micro""".stripMargin
    },
    // Good-Turing mirror: same bigram stream, same spectrum, same
    // integer discount arithmetic
    "q127_good_turing" ->
      """WITH w AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT lang, unnest([w.w[i] || ' ' || w.w[i+1]
        |                            FOR i IN range(1, greatest(len(w.w) - 1, 0) + 1)]) AS bg
        |       FROM w),
        |counts AS (SELECT lang, bg, count(*) AS r FROM bg GROUP BY lang, bg),
        |spectrum AS (SELECT lang, r, count(*) AS n_r FROM counts GROUP BY lang, r)
        |SELECT s.lang, s.r, s.n_r,
        |  (s.r + 1) * coalesce(n1.n_r, 0) * 1000000 // s.n_r AS r_star_micro
        |FROM spectrum s
        |LEFT JOIN spectrum n1 ON n1.lang = s.lang AND n1.r = s.r + 1
        |WHERE s.r <= 10""".stripMargin,
    // oracle = the naive BETWEEN theta join (DuckDB's optimizer owns the
    // small-scale plan; the Spark side's tiling must not change the SET)
    "q126_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id,
        |              CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
        |            FROM events),
        |inc AS (SELECT event_id AS incident_id, user_id,
        |          ts_sec AS start_sec, ts_sec + 1800 AS end_sec
        |        FROM ev WHERE event_type = 'error')
        |SELECT i.incident_id, e.event_id, e.ts_sec - i.start_sec AS offset_sec
        |FROM ev e JOIN inc i
        |  ON e.user_id = i.user_id
        | AND e.ts_sec BETWEEN i.start_sec AND i.end_sec""".stripMargin,
    // overlap mirror: the plain theta join the tiling is provably
    // equivalent to (inclusive bounds both ends)
    "q141_interval_overlap" ->
      """WITH ev AS (SELECT event_id, user_id,
        |              CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type
        |            FROM events),
        |i AS (SELECT event_id AS incident_id, user_id,
        |        ts_sec AS inc_start, ts_sec + 1800 AS inc_end
        |      FROM ev WHERE event_type = 'error'),
        |c AS (SELECT event_id AS click_id, user_id,
        |        ts_sec AS click_start, ts_sec + 600 AS click_end
        |      FROM ev WHERE event_type = 'click')
        |SELECT i.incident_id, c.click_id,
        |  least(i.inc_end, c.click_end) -
        |    greatest(i.inc_start, c.click_start) AS overlap_sec
        |FROM i JOIN c
        |  ON c.user_id = i.user_id
        | AND i.inc_start <= c.click_end
        | AND c.click_start <= i.inc_end""".stripMargin,
    // sketch mirror: identical integer bucketing (binary-string length),
    // cumulative pick at rank ceil(q*N) in integer arithmetic, ceiling
    // estimate 2^bucket - 1; the '__all__' row merges the per-lang
    // sketches by summing bucket counts
    "q125_quantile_sketch" ->
      """WITH d AS (SELECT lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |b AS (SELECT lang, CAST(length(bin(tok)) AS INT) AS bucket FROM d),
        |sk0 AS (SELECT lang, bucket, count(*) AS n FROM b GROUP BY lang, bucket),
        |sk AS (SELECT * FROM sk0
        |       UNION ALL
        |       SELECT '__all__' AS lang, bucket, CAST(sum(n) AS BIGINT) AS n
        |       FROM sk0 GROUP BY bucket),
        |c AS (SELECT lang, bucket, n,
        |        CAST(sum(n) OVER (PARTITION BY lang ORDER BY bucket) AS BIGINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS total
        |      FROM sk),
        |est AS (SELECT lang, cum, total,
        |          (CAST(1 AS BIGINT) << bucket) - 1 AS est FROM c)
        |SELECT lang, max(total) AS n_rows,
        |  min(CASE WHEN cum >= (1*total + 9)//10 THEN est END) AS p10_est,
        |  min(CASE WHEN cum >= (1*total + 1)//2 THEN est END) AS p50_est,
        |  min(CASE WHEN cum >= (9*total + 9)//10 THEN est END) AS p90_est
        |FROM est GROUP BY lang""".stripMargin,
    // the BM25 mirror replays the identical BIGINT products, single
    // double division, floor-to-micro, and exact integer sum
    "q124_bm25_topk" -> bm25OracleSql,
    // the stored-postings lifecycle indexes the SAME corpus (bulk 90% +
    // appended 10% drop) and serves the same queries, so the stored
    // form answers q124's oracle verbatim — any postings drift (missed
    // append, stale stats, bucket mismatch) breaks the hash
    "q139_bm25_index_serve" -> bm25OracleSql,
    // L0 compaction is invisible to the serve: full corpus, same scores
    "q228_postings_l0_compact" -> bm25OracleSql,
    // ...and so is the auto-triggered policy loop (base + 5 appends =
    // full corpus; one mid-loop compaction)
    "q233_auto_compact_policy" -> bm25OracleSql,
    "q158_bm25_delete_serve" -> bm25RestrictedOracleSql("doc_id % 7 <> 3"),
    // snapshot serve: the committed set is seed ∪ the manifested
    // append; the torn batch (% 20 = 10, data files without a manifest
    // row) is invisible
    "q163_bm25_snapshot_serve" -> bm25RestrictedOracleSql("doc_id % 20 <> 10"),
    // time travel to generation 0 = the seed-only corpus (the two
    // committed appends exist but are past the as-of bound; the lost
    // commit never existed to any reader)
    "q164_bm25_time_travel" -> bm25RestrictedOracleSql("doc_id % 10 <> 0"),
    "q166_bm25_expand" -> bm25ExpandOracleSql,
    "q182_mmr_rerank" -> mmrOracleSql,
    // the run replayed, the same floor-micro cosine expression shape,
    // the same threshold cut
    "q183_hard_negatives" ->
      s"""WITH run AS (
         |SELECT qid, doc_id, rn FROM (
         |$bm25OracleSql
         |) t),
         |e AS (SELECT vec_id AS id,
         |        list_transform(embedding,
         |          x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS vm
         |      FROM embeddings),
         |s AS (SELECT run.qid, run.doc_id, run.rn,
         |    CAST(floor(list_dot_product(q.vm, d.vm) * 1000000.0 /
         |      (sqrt(list_dot_product(q.vm, q.vm)) *
         |       sqrt(list_dot_product(d.vm, d.vm)))) AS BIGINT) AS sim_micro
         |  FROM run JOIN e q ON q.id = run.qid
         |           JOIN e d ON d.id = run.doc_id
         |  WHERE run.qid <> run.doc_id)
         |SELECT qid, doc_id, rn, sim_micro FROM s
         |WHERE sim_micro < 350000""".stripMargin,
    // the streaming twin maintains sum-mergeable histograms whose merged
    // state equals the full-corpus counts — same mirror as q185
    "q196_drift_stream" -> driftOracleSql,
    // the absorb collapses partitions whose counts already sum to the
    // full-corpus histogram — same mirror again
    "q202_drift_absorb" -> driftOracleSql,
    "q185_source_drift" -> driftOracleSql,
    // KWIC over the replayed BM25 run: same earliest-term-position
    // rule (1-based both sides), same clamped ±3 token slice
    "q180_kwic_snippets" ->
      s"""WITH run AS (
         |SELECT qid, doc_id, rn FROM (
         |$bm25OracleSql
         |) t),
         |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tok AS (SELECT doc_id, s.pos AS pos, s.tok AS token FROM
         |  (SELECT doc_id, unnest([{'pos': i, 'tok': w.w[i]}
         |                          FOR i IN range(1, len(w.w)+1)]) AS s
         |   FROM w) t),
         |q AS (SELECT doc_id AS qid,
         |        unnest(list_distinct(list_slice(w.w, 1, 4))) AS token
         |      FROM w WHERE doc_id % 200 = 7),
         |fp AS (SELECT run.qid, run.doc_id, run.rn,
         |         CAST(min(tok.pos) AS INT) AS first_pos
         |       FROM run JOIN q ON q.qid = run.qid
         |         JOIN tok ON tok.doc_id = run.doc_id
         |                 AND tok.token = q.token
         |       GROUP BY run.qid, run.doc_id, run.rn)
         |SELECT fp.qid, fp.doc_id, fp.rn, fp.first_pos,
         |  array_to_string(list_slice(w.w,
         |    greatest(fp.first_pos - 3, 1), fp.first_pos + 3), ' ')
         |    AS snippet
         |FROM fp JOIN w ON w.doc_id = fp.doc_id""".stripMargin,
    // SERP dedup over the replayed BM25 run: same fingerprint, same
    // min-per-(qid, sig) keep rule, same dense re-rank
    "q179_result_dedup" ->
      s"""WITH run AS (
         |SELECT qid, doc_id, rn AS rn_orig FROM (
         |$bm25OracleSql
         |) t),
         |sig AS (SELECT doc_id,
         |          md5(array_to_string((string_split(text, ' '))[1:8], ' '))
         |            AS sig
         |        FROM documents),
         |keep AS (SELECT run.qid, run.doc_id, run.rn_orig,
         |           min(run.rn_orig) OVER (PARTITION BY run.qid, sig.sig)
         |             AS keep_rn
         |         FROM run JOIN sig USING (doc_id))
         |SELECT qid, doc_id, rn_orig,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY rn_orig ASC)
         |    AS INT) AS rn
         |FROM keep WHERE rn_orig = keep_rn""".stripMargin,
    // the two runs replayed as derived tables (DuckDB allows WITH
    // inside a subquery), then the same left-join aggregation; sum()
    // skips the unmatched rows' null rank deltas on both engines
    "q177_rank_agreement" ->
      s"""SELECT a.qid, CAST(count(*) AS BIGINT) AS k_a,
         |  CAST(count(b.rn) AS BIGINT) AS n_common,
         |  CAST(sum(abs(a.rn - b.rn)) AS BIGINT) AS rank_l1
         |FROM (
         |$bm25OracleSql
         |) a LEFT JOIN (
         |$bm25ExpandOracleSql
         |) b USING (qid, doc_id)
         |GROUP BY a.qid""".stripMargin,
    "q167_phrase_match" -> phraseOracleSql,
    // stored-positional-index serve over the full corpus ≡ the
    // in-flight q167 — same mirror
    "q170_phrase_index_serve" -> phraseOracleSql,
    // tombstone-deleted serve ≡ a corpus that never held the deleted
    // docs; phrases still come from the full set
    "q173_phrase_delete_serve" -> phraseRestrictedOracleSql("doc_id % 7 <> 3"),
    // the streaming twin's seed ∪ drops = the full corpus — same mirror
    "q175_phrase_stream_serve" -> phraseOracleSql,
    // gid bit order matches Spark's grouping_id(): first rollup column
    // is the most significant bit
    "q171_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
        |    AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q172_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
        |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
        |  CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
        |  CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
        |  CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q142_bm25_stream_serve" -> bm25OracleSql,
    "q152_bm25_absorb_serve" -> bm25OracleSql,
    "q149_heavy_tokens" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS item
         |            FROM documents),
         |sl AS (SELECT item,
         |         (${hexToLongSql("md5(CAST(doc_id AS VARCHAR))", 1, 15)}) % 8
         |           AS slice
         |       FROM tok),
         |c AS (SELECT slice, item, count(*) AS c FROM sl GROUP BY 1, 2),
         |r AS (SELECT slice, item, c, row_number() OVER
         |        (PARTITION BY slice ORDER BY c DESC, item ASC) AS rk
         |      FROM c),
         |t AS (SELECT slice,
         |        coalesce(max(CASE WHEN rk = 21 THEN c END), 0) AS t
         |      FROM r GROUP BY slice),
         |red AS (SELECT r.item, r.c - t.t AS c FROM r JOIN t USING (slice)
         |        WHERE r.rk <= 20 AND r.c - t.t > 0),
         |m AS (SELECT item, CAST(sum(c) AS BIGINT) AS c FROM red GROUP BY item),
         |r2 AS (SELECT item, c, row_number() OVER
         |         (ORDER BY c DESC, item ASC) AS rk FROM m),
         |t2 AS (SELECT coalesce(max(CASE WHEN rk = 21 THEN c END), 0) AS t
         |       FROM r2)
         |SELECT item, c - t2.t AS est_min FROM r2, t2
         |WHERE rk <= 20 AND c - t2.t > 0""".stripMargin,
    "q147_contamination_frac" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id AS id,
        |         unnest(list_distinct([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
        |                               FOR i IN range(1, greatest(len(w.w)-2, 0)+1)])) AS shingle
        |       FROM w),
        |bs AS (SELECT DISTINCT shingle FROM sh WHERE id % 10 = 7),
        |cs AS (SELECT id, shingle FROM sh WHERE id % 10 <> 7)
        |SELECT cs.id AS doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared,
        |  CAST((sum(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)
        |        * 1000000) // count(*) AS BIGINT) AS frac_micro
        |FROM cs LEFT JOIN bs ON bs.shingle = cs.shingle
        |GROUP BY cs.id""".stripMargin,
    "q146_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest([w.w[i] || ' ' || w.w[i+1]
        |                 FOR i IN range(1, greatest(len(w.w)-1, 0)+1)]) AS g
        |       FROM w),
        |cb AS (SELECT g, count(*) AS cg FROM bg GROUP BY g),
        |cp AS (SELECT split_part(g, ' ', 1) AS w1,
        |         CAST(sum(cg) AS BIGINT) AS cw FROM cb GROUP BY 1),
        |sc AS (SELECT bg.doc_id,
        |         length(bin(cp.cw)) - length(bin(cb.cg)) AS bits
        |       FROM bg JOIN cb ON cb.g = bg.g
        |         JOIN cp ON cp.w1 = split_part(bg.g, ' ', 1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(bits) AS BIGINT) AS sum_bits,
        |  CAST((sum(bits) * 1000000) // count(*) AS BIGINT) AS mean_bits_micro
        |FROM sc GROUP BY doc_id""".stripMargin,
    // HLL registers replayed per-nibble md5 → 60-bit h; the '__all__'
    // row comes from the unioned shingle stream — identical to merging
    // per-source registers by max (max over a union = merged max)
    "q155_hll_distinct" -> hllOracleSql,
    // the streaming twin's seed ∪ drops = the full table and HLL merge
    // is max (idempotent), so the served estimates are identical
    "q161_hll_stream" -> hllOracleSql,
    "q145_editdist_neardup" ->
      """WITH s AS (SELECT doc_id,
        |             array_to_string((string_split(text, ' '))[1:5], ' ') AS s
        |           FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM s a JOIN s b
        |  ON a.doc_id < b.doc_id AND abs(len(a.s) - len(b.s)) <= 3
        |WHERE levenshtein(a.s, b.s) <= 3""".stripMargin,
    "q144_kmv_source_overlap" ->
      s"""WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |sg AS (SELECT source,
         |         unnest([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
         |                 FOR i IN range(1, greatest(len(w.w)-2, 0)+1)]) AS shingle
         |       FROM w),
         |sh AS (SELECT DISTINCT source,
         |         ${hexToLongSql("md5(shingle)", 1, 15)} AS h
         |       FROM sg),
         |sk AS (SELECT source, h FROM
         |        (SELECT source, h, row_number() OVER
         |           (PARTITION BY source ORDER BY h ASC) AS rk FROM sh)
         |       WHERE rk <= 128),
         |p AS (SELECT a.source AS g_a, b.source AS g_b
         |      FROM (SELECT DISTINCT source FROM documents) a
         |      JOIN (SELECT DISTINCT source FROM documents) b
         |        ON a.source < b.source),
         |u AS (SELECT p.g_a, p.g_b, sk.h,
         |        max(CASE WHEN sk.source = p.g_a THEN 1 ELSE 0 END) AS in_a,
         |        max(CASE WHEN sk.source = p.g_b THEN 1 ELSE 0 END) AS in_b
         |      FROM p JOIN sk ON sk.source = p.g_a OR sk.source = p.g_b
         |      GROUP BY p.g_a, p.g_b, sk.h),
         |r AS (SELECT g_a, g_b, in_a, in_b, row_number() OVER
         |        (PARTITION BY g_a, g_b ORDER BY h ASC) AS rk FROM u)
         |SELECT g_a AS src_a, g_b AS src_b, count(*) AS u_n,
         |  CAST(sum(in_a * in_b) AS BIGINT) AS inter_n,
         |  CAST((sum(in_a * in_b) * 1000000) // count(*) AS BIGINT)
         |    AS jaccard_micro
         |FROM r WHERE rk <= 128 GROUP BY g_a, g_b""".stripMargin,
    "q143_incremental_agg" -> aggOracleSql,
    "q148_agg_stream" -> aggOracleSql,
    // the committed twin serves seed ∪ both drops = the full corpus;
    // the ledger changes WHERE deltas live, not what the merge returns
    // (a doubled replay would double cnt/sum — this mirror would catch)
    "q252_committed_agg_ingest" -> aggOracleSql,
    // retraction + extreme repair ≡ a corpus that never held the
    // deleted rows
    "q181_agg_retract_serve" -> aggRestrictedOracleSql("doc_id % 7 <> 3"),
    // the streaming gate admits a drop doc iff NO banding pair links it
    // to the corpus (drop 1) or to corpus ∪ drop-1 admissions (drop 2);
    // the pair SQL replays the banding, the two CTEs replay the
    // two-trigger admission order
    "q123_band_stream_ingest" ->
      s"""WITH pairs AS (SELECT id_a, id_b FROM ($minhashOracleSql) p),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |        UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
         |adm1 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 0
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id AND sym.b % 10 <> 0)),
         |adm2 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 10
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id
         |                    AND (sym.b % 10 <> 0
         |                         OR sym.b IN (SELECT doc_id FROM adm1))))
         |SELECT doc_id FROM adm1 UNION ALL SELECT doc_id FROM adm2""".stripMargin,
    // the lossless simhash gate: a drop doc is admitted iff NO hamming-
    // ≤-6 pair links it to the corpus (drop 1) / corpus ∪ drop-1
    // admissions (drop 2) — exact, no recall caveat
    "q136_simhash_stream_ingest" ->
      s"""WITH pairs AS (SELECT id_a, id_b FROM ($simhashOracleSql) p),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |        UNION ALL SELECT id_b AS a, id_a AS b FROM pairs),
         |adm1 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 0
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id AND sym.b % 10 <> 0)),
         |adm2 AS (SELECT doc_id FROM documents d WHERE doc_id % 20 = 10
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |                  WHERE sym.a = d.doc_id
         |                    AND (sym.b % 10 <> 0
         |                         OR sym.b IN (SELECT doc_id FROM adm1))))
         |SELECT doc_id FROM adm1 UNION ALL SELECT doc_id FROM adm2""".stripMargin,
    // the pigeonhole probe is recall-complete (lossless), so the stored
    // lifecycle answers exactly q53's pair SQL on the cross-drop pairs:
    // probe1 = drop1 × corpus, probe2 = drop2 × (corpus ∪ drop1)
    "q122_simhash_index_append" ->
      s"""SELECT id_a, id_b, hamming FROM ($simhashOracleSql) p
         |WHERE ((id_a % 10 = 0) <> (id_b % 10 = 0)
         |        AND id_a % 10 <> 5 AND id_b % 10 <> 5)
         |   OR ((id_a % 10 = 5) <> (id_b % 10 = 5))""".stripMargin,
    // demo payload = ASCII bytes of the doubled md5 hex (64 chars), so a
    // 16-byte frame is a 16-char substring and its hex is the hex of
    // those ASCII chars; stride 2 over 4 frames keeps indexes 0 and 2
    "q113_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, repeat(md5(text), 2) AS p
        |           FROM documents)
        |SELECT media_id, CAST(f_idx AS INT) AS frame_idx,
        |  upper(hex(substring(p, f_idx * 16 + 1, 16))) AS frame_hex
        |FROM m CROSS JOIN (SELECT unnest([0, 2]) AS f_idx) s""".stripMargin,
    // only the kept SET matters to the aggregate, and the (tok desc,
    // doc_id asc) tiebreak makes it engine-identical
    "q114_source_quota" ->
      """WITH r AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY len(string_split(text, ' ')) DESC,
        |                        doc_id ASC) AS rk
        |           FROM documents)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(tok) AS BIGINT) AS tokens_kept
        |FROM r WHERE rk <= 50 GROUP BY source""".stripMargin,
    "q115_train_order" -> {
      val h = hexToLongSql("md5('shuffle:' || CAST(doc_id AS VARCHAR))", 1, 15)
      s"""WITH h AS (SELECT doc_id, CAST($h AS BIGINT) AS hv FROM documents)
         |SELECT CAST(hv % 16 AS INT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY hv % 16
         |    ORDER BY hv ASC, doc_id ASC) AS INT) AS position,
         |  doc_id
         |FROM h""".stripMargin
    },
    // the bloom gate is lossless, so the oracle is the PLAIN anti join
    "q117_bloom_gated_dedup" ->
      """WITH d AS (SELECT doc_id, lang,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |           FROM documents)
        |SELECT doc_id, lang, fp FROM d
        |WHERE doc_id % 7 = 0
        |  AND NOT EXISTS (SELECT 1 FROM d d2
        |                  WHERE d2.doc_id % 7 <> 0 AND d2.fp = d.fp)""".stripMargin,
    // stored-filter variant of q117 — the lifecycle changes the plan,
    // never the answer
    "q118_bloom_index_probe" ->
      """WITH d AS (SELECT doc_id, lang,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |           FROM documents)
        |SELECT doc_id, lang, fp FROM d
        |WHERE doc_id % 9 = 0
        |  AND NOT EXISTS (SELECT 1 FROM d d2
        |                  WHERE d2.doc_id % 9 <> 0 AND d2.fp = d.fp)""".stripMargin
  )

  /** Queries written in the ANSI subset BOTH engines parse identically —
    * used verbatim as the Spark text and the DuckDB oracle.
    */
  val sharedSql: Map[String, String] = Map(
    "q03_sql_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_units,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q14_sql_join_agg" ->
      """SELECT n_name, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name, o_orderpriority""".stripMargin,
    "q43_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)

  /** DuckDB mirror of exact n-gram Jaccard pairs over documents (3-word
    * shingles) at a threshold — brute inverted-index form (the oracle need
    * not replicate the Spark side's PPJoin pruning, which is exact).
    */
  private def oracleJaccardPairs(threshold: Double): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (SELECT doc_id AS id,
       |         unnest(list_distinct([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
       |                               FOR i IN range(1, greatest(len(w.w)-2, 0)+1)])) AS shingle
       |       FROM w),
       |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       |common AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
       |           GROUP BY a.id, b.id)
       |SELECT id_a, id_b,
       |  CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) AS jaccard
       |FROM common
       |JOIN sz za ON za.id = id_a
       |JOIN sz zb ON zb.id = id_b
       |WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= $threshold""".stripMargin

  /** DuckDB rendering of [[graft.operators.Layout.zOrder2]]: the same
    * bit-interleave as a sum of shift/mask terms (both engines compute
    * identical integer arithmetic).
    */
  private def zOrder2Sql(x: String, y: String, bits: Int): String =
    ((0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i})"
    } ++ (0 until bits).map { i =>
      s"((($y >> $i) & 1) << ${2 * i + 1})"
    }).mkString("(", " + ", ")")

  /** DuckDB rendering of Spark's `conv(substring(md5(x), start, len), 16, 10)`
    * — per-nibble positional arithmetic (DuckDB has no conv).
    */
  /** The winnow fingerprint CTE chain over ALL documents — the DuckDB
    * mirror of [[graft.operators.Curation.winnowFingerprints]] (k=4,
    * w=4): relation `f` = distinct (doc_id, fp). Shared by the
    * q211/q214/q215 mirrors; spliced after a WITH.
    */
  private lazy val winnowFpCtes: String = {
    val h = hexToLongSql("md5(array_to_string(list_slice(w, i, i + 3), ' '))", 1, 15)
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT doc_id, s.pos AS pos, s.h AS h FROM
       |  (SELECT doc_id,
       |     unnest([{'pos': i, 'h': CAST($h AS BIGINT)}
       |             FOR i IN range(1, len(w) - 4 + 2)]) AS s
       |   FROM t) x),
       |sel AS (SELECT doc_id,
       |        min({'h': h, 'np': -pos})
       |          OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
       |        count(*)
       |          OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS c
       |      FROM g),
       |f AS (SELECT DISTINCT doc_id, m.h AS fp FROM sel WHERE c = 4)""".stripMargin
  }

  /** Shared count-min mirror (q132 batch sketch, q220 streamed cells —
    * cells merge by addition, so both serve the full-corpus sketch). */
  private lazy val cmOracleSql: String = {
    val h = hexToLongSql("md5(CAST(r AS VARCHAR) || ':' || k)", 1, 15)
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS k FROM documents),
       |cells AS (SELECT k, CAST(r AS INT) AS r,
       |            CAST(CAST($h AS BIGINT) % 1024 AS INT) AS c
       |          FROM tok CROSS JOIN (SELECT unnest(range(4)) AS r) rs),
       |sk AS (SELECT r, c, count(*) AS n FROM cells GROUP BY r, c),
       |q AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS k
       |      FROM documents WHERE doc_id % 250 = 3),
       |qc AS (SELECT k, CAST(r AS INT) AS r,
       |         CAST(CAST($h AS BIGINT) % 1024 AS INT) AS c
       |       FROM q CROSS JOIN (SELECT unnest(range(4)) AS r) rs)
       |SELECT qc.k AS token, CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS est_count
       |FROM qc LEFT JOIN sk ON sk.r = qc.r AND sk.c = qc.c
       |GROUP BY qc.k""".stripMargin
  }

  private def hexToLongSql(hexExpr: String, start: Int, len: Int): String =
    (0 until len).map { k =>
      s"(strpos('0123456789abcdef', substr($hexExpr, ${start + k}, 1)) - 1) * ${1L << (4 * (len - 1 - k))}"
    }.mkString(" + ")

  /** DuckDB mirror of [[Dedup.minHashLshPairs]]: 3-word shingles, ONE md5
    * per shingle split into (h1, h2) Kirsch-Mitzenmacher halves,
    * permutation i = h1 + i·h2, 6 bands × 2 rows, exact-Jaccard verify
    * ≥ 0.5. Band hash sorts "seed:sig" strings lexicographically
    * (= Spark's array_sort).
    */
  private lazy val minhashOracleSql: String = minhashPairsSqlFrom("documents")

  /** Same mirror over an arbitrary (doc_id, text) source expression —
    * lets composed pipelines (q72) run the minhash stage over a gated
    * subset.
    */
  private def minhashPairsSqlFrom(docsSrc: String): String = {
    val h1 = hexToLongSql("md5(shingle)", 1, 15)
    val h2 = hexToLongSql("md5(shingle)", 16, 14)
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM $docsSrc),
       |sh AS (SELECT doc_id AS id,
       |         unnest(list_distinct([w.w[i] || ' ' || w.w[i+1] || ' ' || w.w[i+2]
       |                               FOR i IN range(1, greatest(len(w.w)-2, 0)+1)])) AS shingle
       |       FROM w),
       |hv AS (SELECT id, CAST($h1 AS BIGINT) AS h1, CAST($h2 AS BIGINT) AS h2 FROM sh),
       |sig AS (SELECT id, seed, min(h1 + seed * h2) AS sig
       |        FROM hv CROSS JOIN (SELECT unnest(range(12)) AS seed) seeds
       |        GROUP BY id, seed),
       |bands AS (SELECT id, CAST(seed // 2 AS INT) AS band,
       |            md5(string_agg(CAST(seed AS VARCHAR) || ':' || CAST(sig AS VARCHAR), '|'
       |              ORDER BY CAST(seed AS VARCHAR) || ':' || CAST(sig AS VARCHAR))) AS band_hash
       |          FROM sig GROUP BY id, CAST(seed // 2 AS INT)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
       |sz AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
       |common AS (SELECT c.id_a, c.id_b, count(*) AS n_common
       |           FROM cand c
       |           JOIN sh a ON a.id = c.id_a
       |           JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
       |           GROUP BY c.id_a, c.id_b)
       |SELECT id_a, id_b,
       |  CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) AS jaccard
       |FROM common
       |JOIN sz za ON za.id = id_a
       |JOIN sz zb ON zb.id = id_b
       |WHERE CAST(n_common AS DOUBLE) / (za.n + zb.n - n_common) >= 0.5""".stripMargin
  }

  /** DuckDB mirror of [[Dedup.simHashPairs]] (maxHamming = 6 as used by
    * q53 ⇒ 7 pigeonhole bands), generated so the 60-bit hex→int, per-bit
    * vote, and band-mask arithmetic provably matches the Scala side.
    */
  private lazy val simhashOracleSql: String = {
    // 15-hex-char md5 prefix → BIGINT (= Spark's conv(substr(md5,1,15),16,10))
    val hex2long = hexToLongSql("md5(t)", 1, 15)
    val votes = (0 until 60).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n    ")
    val fp = (0 until 60).map(j =>
      s"CASE WHEN b$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END").mkString(" + ")
    val bandRows = graft.operators.Dedup.simHashBandLayout(6).zipWithIndex
      .map { case ((shift, width), b) =>
        s"($b, (simhash >> $shift) & ${(1L << width) - 1L})"
      }.mkString(", ")
    s"""WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS t FROM documents),
       |h AS (SELECT id, CAST($hex2long AS BIGINT) AS h FROM tok),
       |votes AS (SELECT id,
       |    $votes
       |  FROM h GROUP BY id),
       |fp AS (SELECT id, $fp AS simhash FROM votes),
       |banded AS (SELECT id, simhash, bb.band, bb.bv
       |           FROM fp CROSS JOIN LATERAL (VALUES $bandRows) AS bb(band, bv))
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin
  }

  /** DuckDB mirror of [[TextAnalysis.langId]] over the default markers:
    * replace-trick occurrence counts, first-max-wins argmax, 'und' fallback.
    */
  private lazy val langidOracleSql: String = {
    val langs = TextAnalysis.defaultLangMarkers
    val scores = langs.map { case (lang, ms) =>
      val terms = ms.map { m =>
        s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)"
      }.mkString(" + ")
      s"($terms) AS s_$lang"
    }.mkString(",\n  ")
    // first-max-wins over the marker list order (= Spark's reduce)
    val names = langs.map(_._1)
    val argmax = names.init.zipWithIndex.map { case (l, i) =>
      val rest = names.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("\n    ")
    val anyPositive = names.map(l => s"s_$l > 0").mkString(" OR ")
    s"""WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
       |scored AS (SELECT doc_id, lang,
       |  $scores
       |  FROM p),
       |pred AS (SELECT doc_id, lang,
       |  CASE WHEN NOT ($anyPositive) THEN 'und'
       |    $argmax
       |    ELSE '${names.last}' END AS lang_pred
       |  FROM scored)
       |SELECT doc_id, lang_pred, lang_pred = lang AS is_match FROM pred""".stripMargin
  }
}
