package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys and
  * layout-aware writes. At 100 TB the scan is the dominant cost, and a
  * multi-column skipping layout is how a lakehouse table stays prunable
  * on more than one predicate column: sorting files by the interleaved
  * key gives every file a tight min/max envelope on BOTH dimensions, so
  * parquet row-group / file skipping works for either predicate.
  */
object Layout {

  /** Morton interleave of two non-negative integer columns, each below
    * 2^bits: bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    * integer bit arithmetic (shifts + masks), codegen-friendly, and
    * exactly reproducible in any engine — no library calls.
    */
  def zOrder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i)
    }
    val ys = (0 until bits).map { i =>
      shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }
    (xs ++ ys).reduce(_ + _)
  }

  /** Write `df` clustered by the z-value of (x, y): range-partition on
    * the z key (contiguous z ranges per output file), sort within each
    * partition, drop the helper column, write parquet. numFiles controls
    * the file count — at scale, size it so each file is ~128-512 MB.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zOrder2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** EXCLUSIVE global prefix sum of `nTokensCol` over ascending
    * `idCol` order — each document's starting offset in the
    * concatenated corpus token stream. The distributed scan is the
    * classic two-phase pattern (the [[Relational.allocateIds]]
    * sort-then-index idiom, generalized from counting to summing):
    * range-partitioned global sort, pass 1 reduces each partition to
    * ONE (partition, sum) row collected to the driver (bounded: one
    * row per partition), pass 2 re-reads the sorted shuffle output
    * and emits running totals seeded by the scanned per-partition
    * offsets — no single-partition window anywhere, so the scan holds
    * at any corpus size. Zero-token documents are dropped (they
    * contribute nothing to the stream and would otherwise produce
    * zero-length spans).
    *
    * @return (doc_id, n_tokens, start) with `start` the exclusive
    *         running sum in doc_id order
    */
  def tokenOffsets(docs: DataFrame, idCol: String,
      nTokensCol: String): DataFrame = {
    val spark = docs.sparkSession
    // ids order the stream here: the long cast must be lossless. A
    // string/decimal id would cast to null, sort first, and die with an
    // opaque NullPointerException deep in the RDD pass — fail loudly up
    // front instead (the connectedComponents discipline), and guard
    // actual null ids in-plan (assert_true is null on success, so the
    // `when` passes the value through and no rewrite can drop the check).
    def requireIntegral(c: String): Unit = {
      import org.apache.spark.sql.types._
      val dt = docs.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"tokenOffsets needs integral columns; '$c' is $dt " +
          "(map string ids to longs first, e.g. via a surrogate-key join)")
    }
    requireIntegral(idCol); requireIntegral(nTokensCol)
    val sorted = docs.select(
        when(assert_true(col(idCol).isNotNull,
            lit(s"tokenOffsets: null $idCol — every document needs an id"))
          .isNull, col(idCol).cast("long")).as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .orderBy(col("doc_id"))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
        Iterator.single((i, it.map(_._2).sum))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive partition bases
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { case (id, n) =>
        val st = acc; acc += n
        org.apache.spark.sql.Row(id, n, st)
      }
    }
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** GPT-style SEQUENCE PACKING (concatenate-and-chunk): lay the
    * corpus out as one deterministic token stream (documents in
    * doc-id order) and cut it into fixed `seqLen`-token training
    * chunks, documents crossing chunk boundaries — the standard
    * padding-free LLM pretraining layout (GPT-2/3 et al.), as opposed
    * to first-fit bin packing whose greedy state is inherently
    * sequential. The output is the packing PLAN — one row per
    * (chunk, document) span — which is what an indexed data loader
    * consumes; no token array is ever materialized, so the operator
    * moves |documents| rows, not |tokens|.
    *
    * Cost: the [[tokenOffsets]] two-phase scan plus a map-side
    * bounded explode (a document lands in 1 + ⌊(n−1+start mod L)/L⌋
    * consecutive chunks). Every chunk except possibly the last covers
    * exactly `seqLen` tokens; every document's spans reconstruct it
    * contiguously (PackingSpec pins both).
    *
    * @return (chunk_id, doc_id, doc_off, chunk_off, len): tokens
    *         [doc_off, doc_off+len) of doc_id occupy positions
    *         [chunk_off, chunk_off+len) of chunk_id
    */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val L = seqLen.toLong
    tokenOffsets(docs, idCol, nTokensCol)
      .select(col("doc_id"), col("n_tokens"), col("start"),
        explode(sequence(expr(s"start div $L"),
          expr(s"(start + n_tokens - 1) div $L"))).as("chunk_id"))
      .select(col("chunk_id"), col("doc_id"),
        greatest(lit(0L), col("chunk_id") * L - col("start")).as("doc_off"),
        (greatest(col("start"), col("chunk_id") * L) - col("chunk_id") * L)
          .as("chunk_off"),
        (least(col("start") + col("n_tokens"), (col("chunk_id") + 1L) * L) -
          greatest(col("start"), col("chunk_id") * L)).as("len"))
  }

  /** WHOLE-DOCUMENT BIN PACKING (the SFT/instruction-tuning layout:
    * sequences must NOT cross document boundaries, so the unit is a
    * BIN of whole documents padded to `capacity` — the complement of
    * [[packSequences]]' concat-and-chunk). Exact first-fit-decreasing
    * is inherently sequential (every placement consults a global
    * mutable bin state), so at corpus scale this is CLASS-BASED
    * (harmonic-style) packing — fully relational, deterministic, and
    * with a provable waste bound:
    *
    *   - slot count  k = ⌊capacity / n⌋  (same-k docs pack k per bin);
    *   - rank within the class by (n desc, doc_id) — a total order, so
    *     the plan is reproducible anywhere;
    *   - bin = the class's rank ⁄ k-th bin; bins number densely across
    *     classes (k ascending — longest docs first) via driver-side
    *     class bases (bounded: ≤ capacity classes).
    *
    * Same-class docs have n ∈ (C/(k+1), C/k], so every bin except
    * possibly the last of each class is > C·k/(k+1) ≥ C/2 full — the
    * classic harmonic guarantee (≤ 2× OPT bins) vs FFD's 11/9, paid
    * for a plan with ONE global range sort (the two-phase
    * [[Relational.allocateIds]] index, no single-partition window) and
    * a ≤-capacity-row driver aggregate. Documents with n > capacity
    * cannot pack and are EXCLUDED — gate upstream (q212's span trim /
    * q109's rare-token gate own oversize handling); zero-token docs
    * are dropped as in [[tokenOffsets]].
    *
    * @return (bin_id, doc_id, slot, n_tokens, slots): doc_id is the
    *         slot-th of the slots same-class documents of bin_id;
    *         Σ n_tokens within a bin ≤ capacity by construction
    */
  def packBins(docs: DataFrame, idCol: String, nTokensCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    val C = capacity.toLong
    val classed = docs.select(col(idCol).cast("long").as("doc_id"),
        col(nTokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1L && col("n_tokens") <= C)
      .withColumn("slots", expr(s"$C div n_tokens"))
    // global index over the (slots asc, n desc, id asc) total order:
    // ranks within a class are then idx − first idx of the class
    val sorted = classed.orderBy(col("slots"), col("n_tokens").desc,
      col("doc_id"))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getLong(2), i)
    }
    val indexed = spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("slots",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // per-class first index and dense bin base, from class COUNTS alone
    // (≤ capacity rows to the driver): the global order is
    // slots-ascending primary, so first_idx(k) = Σ cnt(k' < k) — no
    // second pass over the sorted relation, the global sort runs ONCE
    val classStats = classed.groupBy(col("slots"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("slots")).collect()
    var firstIdx = 0L
    var base = 0L
    val classRows = classStats.map { r =>
      val (k, cnt) = (r.getLong(0), r.getLong(1))
      val out = (k, firstIdx, base)
      firstIdx += cnt
      base += (cnt + k - 1L) / k // ceil(cnt / k) bins for this class
      out
    }.toSeq
    import spark.implicits._
    val bases = classRows.toDF("slots", "first_idx", "bin_base")
    indexed.join(broadcast(bases), Seq("slots"))
      .select(
        (col("bin_base") +
          expr("(idx - first_idx) div slots")).as("bin_id"),
        col("doc_id"),
        expr("(idx - first_idx) % slots").as("slot"),
        col("n_tokens"), col("slots"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998 — the consistent-placement scheme behind cache
    * rings and shard maps): a key's shard is the argmax over shards of
    * an (key, shard) hash. The property that matters at 100 TB: growing
    * N → N+1 shards moves EXACTLY the keys whose new shard wins the
    * argmax — an expected 1/(N+1) of the data — while a mod-N
    * assignment reshuffles (N−1)/N of everything. Fully deterministic
    * (md5, the [[Curation.md5Bucket]] discipline): any engine, any
    * partitioning, same map.
    *
    * Plan shape: one bounded explode (×nShards) and one per-key argmax
    * window — scan-linear, shuffled on the key once. For the pure
    * column form at fixed small N an unrolled greatest-of expression
    * would avoid even that shuffle; the relational form keeps N a
    * runtime parameter.
    *
    * @return (idCol, shard) — shard ∈ [0, nShards)
    */
  def rendezvousShards(df: DataFrame, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__hrw").desc, col("shard").asc)
    df.select(col(idCol)).distinct()
      .select(col(idCol),
        explode(sequence(lit(0), lit(nShards - 1))).as("shard"))
      .withColumn("__hrw",
        conv(substring(md5(concat(lit("rv:"), col(idCol).cast("string"),
          lit(":"), col("shard").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("shard"))
  }
}
