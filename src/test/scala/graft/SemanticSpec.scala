package graft

import graft.operators.{Curation, Similarity}
import org.apache.spark.sql.functions._

/** Specs for the semantic-curation additions: SemDeDup, cluster-quota
  * diversity sampling, HyperLogLog registers, and DSIR importance
  * scores.
  */
class SemanticSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  /** Driver-side quantized corpus: (id, milli vector). */
  private def quantized(): Array[(Long, Array[Long])] =
    emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000))
      }.sortBy(_._1)

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.indices.foldLeft(0L)((s, i) => s + a(i) * b(i))

  test("semDedup matches a plain-Scala reference of the full policy") {
    val threshold = 0.35
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 16)
    val normSq = cents.map(c => c.map(x => x * x).sum)
    // reference: argmax cell (first max wins), centroid cosine, within-
    // cell domination by (lower csim, lower id)
    val rows = quantized().map { case (id, v) =>
      val scores = cents.map(c => dot(v, c))
      val cell = scores.indexOf(scores.max)
      val csim = scores(cell) /
        (math.sqrt(dot(v, v).toDouble) * math.sqrt(normSq(cell).toDouble))
      (id, v, cell, csim)
    }
    val expected = rows.map { case (id, v, cell, csim) =>
      val dominated = rows.exists { case (id2, v2, cell2, csim2) =>
        id2 != id && cell2 == cell && {
          val cos = dot(v, v2) /
            (math.sqrt(dot(v, v).toDouble) * math.sqrt(dot(v2, v2).toDouble))
          cos >= threshold &&
            (csim2 < csim || (csim2 == csim && id2 < id))
        }
      }
      (id, cell, csim, if (dominated) 0 else 1)
    }.toSet
    val got = Similarity.semDedup(emb, "vec_id", "embedding", threshold)
      .select($"vec_id", $"cell", $"centroid_sim", $"kept")
      .as[(Long, Int, Double, Int)].collect().toSet
    assert(got == expected) // exact: integer dots + identical IEEE ops
    assert(got.exists(_._4 == 0) && got.exists(_._4 == 1),
      "fixture should exercise both kept and dropped")
  }

  test("semDedup drops an injected exact duplicate, keeps the lower id") {
    val dup = emb.filter($"vec_id" === 0)
      .select(lit(99999L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.semDedup(emb.unionByName(dup), "vec_id",
        "embedding", threshold = 0.35)
      .select($"vec_id", $"kept").as[(Long, Int)].collect().toMap
    // identical vectors share a cell at cosine 1 with equal centroid
    // cosine — the tiebreak dominates the higher id, so the clone can
    // never survive (vec 0 itself may or may not be dominated by a
    // third doc; that's the corpus's business)
    assert(out(99999L) == 0)
  }

  test("diverseSample: per-cell cap, contiguous positions, deterministic") {
    val quota = 10
    val out = Similarity.diverseSample(emb, "vec_id", "embedding", quota)
      .select($"vec_id", $"cell", $"pos").as[(Long, Int, Int)].collect()
    val byCell = out.groupBy(_._2)
    assert(byCell.values.forall(_.length <= quota))
    byCell.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length)) // 1..n per cell
    }
    val corpusIds = emb.select($"vec_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet.subsetOf(corpusIds))
    val again = Similarity.diverseSample(emb, "vec_id", "embedding", quota)
      .select($"vec_id", $"cell", $"pos").as[(Long, Int, Int)].collect()
    assert(out.toSet == again.toSet)
  }

  test("hllMerge of per-group sketches equals the bulk sketch") {
    val docs = Tables(spark, sf, "documents")
      .select($"source", explode(split($"text", " ")).as("w"))
    val perSource = Curation.hllSketch(docs, Seq("source"), "w")
    val merged = Curation.hllMerge(
        perSource.withColumn("source", lit("__all__")), Seq("source"))
      .select($"bucket", $"r").as[(Int, Int)].collect().toSet
    val bulk = Curation.hllSketch(
        docs.withColumn("source", lit("__all__")), Seq("source"), "w")
      .select($"bucket", $"r").as[(Int, Int)].collect().toSet
    assert(merged == bulk)
  }

  test("hllEstimate: known cardinality within the error band; duplicate-insensitive") {
    val n = 3000
    val items = spark.range(n)
      .select(lit("g").as("g"), md5($"id".cast("string")).as("w"))
    val est = Curation.hllEstimate(
        Curation.hllSketch(items, Seq("g"), "w"), Seq("g"))
      .select($"hll_est").as[Long].head()
    // raw-estimator regime (n >> 2.5m); ±1.04/√64 ≈ 13% stderr, assert 3σ
    assert(math.abs(est - n).toDouble / n < 0.4, s"est=$est for n=$n")
    val doubled = items.unionByName(items) // HLL ignores duplicates
    val est2 = Curation.hllEstimate(
        Curation.hllSketch(doubled, Seq("g"), "w"), Seq("g"))
      .select($"hll_est").as[Long].head()
    assert(est2 == est)
  }

  test("dsir: disjoint-vocab fixture separates target from raw") {
    val docs = Seq(
      (1L, "aa ab aa", true), (2L, "ab aa ab aa", true),
      (3L, "zz zy zz", false), (4L, "zy zz", false)
    ).toDF("doc_id", "text", "is_t")
    val wts = Curation.dsirBucketWeights(docs, "doc_id", "text",
      isTarget = $"is_t", nBuckets = 64).toMap
    assert(wts.values.exists(_ > 0) && wts.values.exists(_ < 0))
    val out = Curation.dsirWeights(docs, "doc_id", "text",
        isTarget = $"is_t", nBuckets = 64)
      .select($"doc_id", $"n_feats", $"sum_bits_micro", $"mean_bits_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(3L, 4L, 3L, 2L)) // token counts
    assert(out(0)._3 > 0 && out(1)._3 > 0, "target docs score positive")
    assert(out(2)._3 < 0 && out(3)._3 < 0, "raw docs score negative")
    // mean is the truncated integer quotient (both engines truncate)
    out.foreach(r => assert(r._4 == r._3 / r._2))
  }

  test("dsirBucketWeights is deterministic and bounded by nBuckets") {
    val docs = Tables(spark, sf, "documents")
    val w1 = Curation.dsirBucketWeights(docs, "doc_id", "text",
      isTarget = $"lang" === "en", nBuckets = 1024)
    val w2 = Curation.dsirBucketWeights(docs, "doc_id", "text",
      isTarget = $"lang" === "en", nBuckets = 1024)
    assert(w1 == w2)
    assert(w1.size <= 1024 && w1.map(_._1).distinct.size == w1.size)
  }
}
