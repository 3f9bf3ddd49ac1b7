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
}
