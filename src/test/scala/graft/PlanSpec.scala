package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions — the scale contract. These lock in the plans
  * we actually want (pushdown reaching parquet, dims broadcast, top-k not
  * globally sorted) so a refactor that silently degrades a plan fails CI,
  * not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def planOf(q: String): SparkPlan =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02: filters and projection are pushed into the parquet scan") {
    val s = formatted("q02_filter_project")
    assert(s.contains("PushedFilters") && s.contains("GreaterThanOrEqual(l_shipdate"))
    assert(s.contains("LessThan(l_quantity,24.0)"))
    // pruned read: untouched columns never leave the file
    assert(!s.contains("l_tax") && !s.contains("l_returnflag"))
  }

  test("q10: all three joins broadcast; fact table is never shuffled for the join") {
    val s = formatted("q10_join_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3)
    assert(!s.contains("SortMergeJoin"))
  }

  test("q21: global top-k plans TakeOrderedAndProject, not a full sort") {
    val s = formatted("q21_sort_limit")
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final (map-side combine before shuffle)") {
    val s = formatted("q01_pricing_summary")
    // tree lines only (the detail section repeats node names)
    assert("\\+- HashAggregate".r.findAllIn(s).size +
      "^HashAggregate".r.findAllIn(s).size >= 2)
    assert("\\+- Exchange".r.findAllIn(s).size == 1)
  }

  test("q12: NOT IN planned as a broadcast anti join") {
    val s = formatted("q12_anti_join")
    assert(s.contains("LeftAnti"))
    assert(s.contains("Broadcast"))
  }

  test("q13: EXISTS planned as a semi join") {
    val s = formatted("q13_semi_join")
    assert(s.contains("LeftSemi"))
  }

  test("core scan queries stay inside whole-stage codegen") {
    for (q <- Seq("q02_filter_project", "q30_case_chain", "q34_conditional_clean")) {
      val s = formatted(q)
      assert(s.contains("codegen id"), s"$q fell out of codegen")
    }
  }

  test("q31: small lookup map is broadcast, never shuffled") {
    val s = formatted("q31_lookup_normalize")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoopJoin"))
  }

  test("q55/q65: embedding near-dup plans have NO cartesian product") {
    for (q <- Seq("q55_embedding_neardup", "q65_dedup_ensemble")) {
      val s = formatted(q)
      assert(!s.contains("CartesianProduct"), s"$q plans a CartesianProduct")
      assert(!s.contains("BroadcastNestedLoopJoin"),
        s"$q plans a BroadcastNestedLoopJoin")
    }
    // the default ensemble's embedding leg is the BANDED sub-quadratic
    // path — no triangle-tiled n² self-join may appear in its plan (the
    // exact tiled scan lives only in the named baseline q55)
    val ens = formatted("q65_dedup_ensemble")
    assert(!ens.contains("tile_i"), "q65 regressed to the tiled O(n²) leg")
    assert(formatted("q55_embedding_neardup").contains("tile_i"),
      "q55 must remain the tiled exact baseline")
  }

  test("q103: salted join replicates the build side and joins on (key, salt)") {
    val s = formatted("q103_salted_join")
    // the right side fans out through a Generate(explode) of the salts...
    assert(s.contains("Generate") && s.contains("explode"),
      "salted build side must replicate via explode")
    // ...and the join key carries the salt column, so one hot key spreads
    // over `salts` shuffle partitions instead of one straggler
    assert(s.contains("__salt"), "join keys must include the salt")
    assert(!s.contains("CartesianProduct"))
  }

  test("q67: banded near-dup joins on (tbl, bucket), no cartesian") {
    val s = formatted("q67_neardup_lsh_banded")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("q75: deterministic sampling is scan-linear — zero shuffles") {
    val s = formatted("q75_stratified_sample")
    assert(!s.contains("Exchange"), "sampling must not shuffle")
    assert(s.contains("codegen id"), "sampling predicate fell out of codegen")
  }

  test("q77: vocabulary top-k plans TakeOrderedAndProject after the agg") {
    val s = formatted("q77_vocab_topk")
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("q80: incremental dedup plans an anti join on the fingerprint") {
    val s = formatted("q80_incremental_dedup")
    assert(s.contains("LeftAnti"))
    assert(!s.contains("CartesianProduct"))
  }

  test("q109: tf join splits hot/cold — broadcast head + anti-filtered tail") {
    val s = formatted("q109_rare_token_gate")
    // the hot head joins via broadcast, so hot tokens never shuffle...
    assert(s.contains("BroadcastHashJoin"), "hot tf head must broadcast")
    // ...and the cold branch pre-filters hot keys with a broadcast ANTI
    // join, so they are absent from the cold exchange, not merely
    // dropped at its probe
    assert(s.contains("LeftAnti"), "cold branch must anti-filter hot keys")
    assert(!s.contains("CartesianProduct"))
  }

  test("q116: IVF-PQ scores candidates via a broadcast cell join — no cartesian") {
    val s = formatted("q116_ann_ivf_pq_topk")
    // probed queries broadcast to the coded corpus; candidates meet on
    // the coarse cell key, never as a cross product
    assert(s.contains("BroadcastHashJoin"), "probed queries must broadcast")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("weak-list guard: NO catalog query beyond q54/q55 plans a quadratic shape") {
    // the catalog-wide regression guard for the `weak` list: the only
    // rows allowed a cartesian/nested-loop/tile-grid plan are the two
    // NAMED exact baselines (q54 brute-force top-k, q55 exact
    // threshold near-dup) — each of which has a sub-quadratic sibling.
    // A future addition that silently reintroduces an all-pairs
    // default fails here, not on the 100 TB run.
    val exempt = Set("q54_ann_brute_topk", "q55_embedding_neardup")
    // the rows below are allowed a bounded number of nested-loop
    // joins: each crossJoin side is a SINGLE-ROW global aggregate (the
    // scalar-subquery shape — the BM25 rows broadcast their one-row
    // (N, T) corpus stats into the score expression) — that nested loop
    // is O(n·1), linear, not an all-pairs plan. The cap (rather than a
    // blanket exemption) means a future regression that adds a GENUINE
    // all-pairs nested loop to one of these plans still fails here.
    val bnljBudget = Map(
      "q47_scalar_subquery" -> 1, "q124_bm25_topk" -> 1,
      "q139_bm25_index_serve" -> 1, "q142_bm25_stream_serve" -> 1,
      "q152_bm25_absorb_serve" -> 1, "q158_bm25_delete_serve" -> 1,
      "q163_bm25_snapshot_serve" -> 1, "q164_bm25_time_travel" -> 1,
      // same one-row (N, T) stats broadcast as every BM25 serve row
      "q228_postings_l0_compact" -> 1,
      "q233_auto_compact_policy" -> 1,
      "q240_zonemap_range_serve" -> 1,
      "q241_committed_postings_ingest" -> 1,
      // the lineage row's serve IS a BM25 serve (index built from the
      // pinned docstore generation) — same one-row stats broadcast
      "q260_lineage_pinned_build" -> 1,
      // round 1 of the feedback loop materializes behind a
      // localCheckpoint, so only round 2's stats broadcast remains in
      // the served plan
      "q166_bm25_expand" -> 1,
      // ranked values × the 9-row quantile-spec literal broadcast:
      // O(n·9), the same bounded-literal shape as the stats rows
      "q201_exact_quantiles" -> 1,
      // one-row corpus token total broadcast into the lift score
      "q206_collocations" -> 1,
      // one-row bigram-type total broadcast into the continuation
      // probability (the same single-row stats shape)
      "q219_kneser_ney" -> 1,
      // corpus scan × the BROADCAST EVAL SUITE — bounded by contract
      // (an eval set is thousands of items, the q83 benchmark-side
      // rule), so the loop is O(corpus·|eval|), corpus-linear, and
      // deliberately EXACT: a decontamination miss is eval leakage,
      // no ANN shortlist substitutes. A second BNLJ here (or a
      // genuine all-pairs) still fails the cap.
      "q261_semantic_decontam" -> 1
    ).withDefaultValue(0)
    // each physical instance appears exactly once as a "(NN) Broadcast-
    // NestedLoopJoin" detail header in formatted mode (tree lines
    // repeat the name without the id)
    val bnljInstance = "\\(\\d+\\) BroadcastNestedLoopJoin".r
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exempt)
      .flatMap { q =>
        val s = formatted(q)
        val bnljN = bnljInstance.findAllIn(s).size
        Seq(
          if (s.contains("CartesianProduct")) Some(s"$q: CartesianProduct") else None,
          if (bnljN > bnljBudget(q))
            Some(s"$q: $bnljN BroadcastNestedLoopJoin") else None,
          if (s.contains("tile_i")) Some(s"$q: tile_i grid") else None
        ).flatten
      }
    assert(offenders.isEmpty,
      s"quadratic plan shapes outside the named exact baselines:\n  ${offenders.mkString("\n  ")}")
  }

  test("q235/q239: the layout rows carry NO Window operator — the " +
      "global scan is the two-phase index, never a single-partition " +
      "window") {
    // the claim these rows make ("no single-partition window anywhere")
    // as a plan property: a future rewrite that sneaks a global
    // row_number()/sum() window back in fails here, not at 100 TB
    for (q <- Seq("q235_sequence_packing", "q239_bin_packing")) {
      val s = formatted(q)
      assert(!s.contains("Window"),
        s"$q plans a Window operator — the two-phase scan was lost")
    }
  }

  test("q246/q250/q251: suffix-span serves keep every exchange keyed — " +
      "no single-partition stage; the report is a TakeOrdered") {
    // the suffix pipeline's eager half (rank doubling) is two-phase
    // RDD scans by construction; this pins the SERVED half: islands
    // merge under doc-partitioned windows and the only global
    // operation in the report row is the TakeOrderedAndProject limit
    for (q <- Seq("q246_suffix_dup_spans", "q250_suffix_trim")) {
      val s = formatted(q)
      assert(!s.contains("SinglePartition"),
        s"$q plans a single-partition exchange:\n$s")
    }
    val rep = formatted("q251_boilerplate_report")
    assert(rep.contains("TakeOrderedAndProject"),
      "q251 must plan its top-k as TakeOrderedAndProject, not a global sort")
  }

  test("q117: bloom gate confirms and anti-joins via broadcast — the corpus never sort-merges") {
    val s = formatted("q117_bloom_gated_dedup")
    // the exact-confirm semi join and the final anti join both run
    // against broadcast candidate sets, scan-side on their big inputs
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      "bloom positives must exact-confirm via a broadcast semi join")
    assert(s.contains("LeftAnti"),
      "confirmed members must be removed with an anti join")
    // no plan shape may sort-merge the corpus against the batch
    assert(!s.contains("SortMergeJoin"), "corpus must never shuffle for a join")
    assert(!s.contains("CartesianProduct"))
  }

  test("q124: BM25 joins broadcast the query side; postings never sort-merge") {
    val s = formatted("q124_bm25_topk")
    // qterms/df/stats all ride broadcast joins onto the postings scan;
    // the only exchanges are the postings build and the (qid, doc) agg
    assert(s.contains("BroadcastHashJoin"),
      "query-side joins must broadcast")
    assert(!s.contains("SortMergeJoin"),
      "the postings table must never sort-merge against the tiny sides")
    // partial+final aggregation around the postings exchange
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "aggregates must be partial+final")
  }
}
