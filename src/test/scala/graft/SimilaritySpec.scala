package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("bruteForceTopK: k rows per query, no self, ranked by cosine desc") {
    val queries = emb.filter($"vec_id" < 3)
    val out = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    val rows = out.select($"query_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 15)
    assert(!rows.exists(r => r._1 == r._2))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("bruteForceTopK finds an exact duplicate vector as nearest neighbor") {
    val dup = emb.filter($"vec_id" === 0)
      .select(lit(99999L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(dup)
    val top = Similarity.bruteForceTopK(emb.filter($"vec_id" === 0), corpus,
      "vec_id", "embedding", 1)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].head()
    assert(top._1 == 99999L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("lshTopK: recall@10 vs brute force is reasonable") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.2, s"LSH recall too low: $recall") // probe-limited, sanity floor
  }

  test("ivfTopK: recall@10 vs brute force with nprobe=4 of 16 cells") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("nearDupPairs is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.nearDupPairs(emb.limit(100), "vec_id", "embedding", 0.3)
      .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0.3))
  }

  test("tiled nearDupPairs equals the brute-force pair set exactly") {
    // independent brute reference, computed with the same quantization
    val q = emb.select($"vec_id", Similarity.quantize($"embedding").as("v"))
    val a = q.select($"vec_id".as("id_a"), $"v".as("va"))
    val b = q.select($"vec_id".as("id_b"), $"v".as("vb"))
    val dl = org.apache.spark.sql.graft.VectorExpressions
    val brute = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (dl.dot_long($"va", $"vb") /
          (sqrt(dl.dot_long($"va", $"va").cast("double")) *
           sqrt(dl.dot_long($"vb", $"vb").cast("double")))).as("cosine"))
      .filter($"cosine" >= 0.35)
      .as[(Long, Long, Double)].collect().toSet
    val tiled = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.35)
      .as[(Long, Long, Double)].collect().toSet
    assert(tiled == brute, s"tiled=${tiled.size} brute=${brute.size}")
    // and with a tile count that doesn't divide the corpus evenly
    val tiled5 = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.35, nTiles = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(tiled5 == brute)
  }

  test("autoTiles grows with input and floors at cluster-coverage") {
    val par = 32
    val floor = Similarity.autoTiles(0, 560, par)
    // tile-pair grid nTiles·(nTiles+1)/2 must cover the parallelism
    assert(floor * (floor + 1) / 2 >= par)
    val small = Similarity.autoTiles(2000, 560, par)
    val big = Similarity.autoTiles(2000L * 10000, 560, par)
    assert(small == floor, "tiny input stays at the coverage floor")
    assert(big > small, "tile count must grow with input volume")
    // memory bound dominates at scale: one tile's bytes stay ≤ target
    val n = 2000L * 10000
    assert(n / big * 560 <= (64L << 20))
    assert(Similarity.autoTiles(Long.MaxValue / 1000, 560, par) == 4096,
      "cap holds")
  }

  test("nearDupPairsBanded is a subset of exact pairs with identical cosines") {
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.45)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val banded = Similarity.nearDupPairsBanded(emb, "vec_id", "embedding", 0.45)
      .as[(Long, Long, Double)].collect()
    assert(banded.nonEmpty, "banding should recover some qualifying pairs")
    banded.foreach { case (ia, ib, c) =>
      assert(exact.contains((ia, ib)), s"($ia,$ib) not in exact set")
      assert(exact((ia, ib)) == c, "verify cosine must equal the exact cosine")
    }
  }

  test("persisted IVF index: save/load round trip serves identical top-k") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val direct = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(emb, "vec_id", "embedding"), dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val served = Similarity.ivfSearchIndex(queries, loaded, "vec_id", "embedding", 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == direct)
    // the at-rest layout is partitioned by cell → probes prune partitions
    val cells = new java.io.File(s"$dir/assignments").listFiles()
      .map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1)
  }

  test("appendIvfIndex serves the union without retraining or rewriting") {
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val queries = emb.filter($"vec_id" % 25 === 0)
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding"), dir)
    val filesBefore = new java.io.File(s"$dir/assignments").listFiles().length
    Similarity.appendIvfIndex(spark, dir, batch, "vec_id", "embedding")
    val idx = Similarity.loadIvfIndex(spark, dir)
    val served = Similarity.ivfSearchIndex(queries, idx, "vec_id", "embedding", 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    // equivalent in-memory shape: centroids from the CORPUS ONLY, search
    // over everything
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", 16)
    val direct = Similarity.ivfSearch(queries, emb, "vec_id", "embedding", 10,
        cents, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == direct)
    // appended vectors are actually searchable (batch ids appear)
    assert(served.exists(_._2 % 10 == 0))
    // append added files; it did not rewrite the corpus partition files
    assert(new java.io.File(s"$dir/assignments").listFiles().length >= filesBefore)
  }

  test("K successive appends ≡ one bulk assign; earlier files never touched") {
    // the retrain-offline contract: appends only ASSIGN to the stored
    // centroids, so N nightly drops must land exactly where one combined
    // drop would, and drift can only accumulate in centroid fit (fixed
    // by an offline rebuild), never in the stored assignments
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batches = Seq(
      emb.filter($"vec_id" % 30 === 0),
      emb.filter($"vec_id" % 30 === 10),
      emb.filter($"vec_id" % 30 === 20))
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    Similarity.saveIvfIndex(
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding"), dir)
    for (b <- batches) {
      val before = parquetStamps(s"$dir/assignments")
      Similarity.appendIvfIndex(spark, dir, b, "vec_id", "embedding")
      val after = parquetStamps(s"$dir/assignments")
      // strictly additive: every pre-existing data file survives with
      // its path and mtime intact
      before.foreach { case (path, mtime) =>
        assert(after.contains(path), s"append removed $path")
        assert(after(path) == mtime, s"append rewrote $path")
      }
      assert(after.size > before.size, "append must add data files")
    }
    val stored = Similarity.loadIvfIndex(spark, dir).assignments
      .select($"neighbor_id", $"cell").as[(Long, Int)].collect().toSet
    // one bulk assign of corpus + all three drops to the SAME centroids
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", 16)
    val all = corpus.unionByName(batches.reduce(_ unionByName _))
    val bulk = all
      .select($"vec_id".as("neighbor_id"),
        Similarity.nearestCell(Similarity.quantize($"embedding"), cents).as("cell"))
      .as[(Long, Int)].collect().toSet
    assert(stored == bulk)
  }

  test("integer k-means training is deterministic across invocations") {
    val c1 = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 16)
    val c2 = Similarity.trainCentroids(
      emb.repartition(7), "vec_id", "embedding", nlist = 16)
    assert(c1.length == 16)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "long-sum k-means must be partition-order independent")
  }

  test("embeddingOutliers ranks the planted far vector first in its group") {
    // group 0: four vectors at ~(1,0) and one planted at (-1,0) — the
    // planted one is farthest from the centroid; group 1 is tight
    val rows = Seq(
      (1L, Array(1.00f, 0.01f), 0), (2L, Array(0.99f, -0.01f), 0),
      (3L, Array(1.01f, 0.02f), 0), (4L, Array(1.00f, 0.00f), 0),
      (5L, Array(-1.00f, 0.00f), 0),
      (6L, Array(0.00f, 1.00f), 1), (7L, Array(0.01f, 0.99f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(rows, "vec_id", "embedding",
        "label", topK = 2)
      .select($"label", $"vec_id", $"rk").as[(Int, Long, Int)].collect()
    val g0 = out.filter(_._1 == 0).sortBy(_._3).map(_._2).toSeq
    assert(g0.head == 5L, s"planted outlier must rank first, got $g0")
    assert(out.count(_._1 == 1) == 2)
  }

  test("embeddingOutliers ties break on id and ranking is exact-integer") {
    // two vectors symmetric around the centroid: identical dist2 — the
    // smaller id must win rank 1 (deterministic under any partitioning)
    val rows = Seq(
      (10L, Array(1.0f, 0.0f), 0), (11L, Array(-1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(rows, "vec_id", "embedding",
        "label", topK = 2)
      .select($"vec_id", $"dist2_milli", $"rk").as[(Long, Long, Int)].collect()
      .sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(10L, 11L))
    assert(out(0)._2 == out(1)._2)
  }

  test("PQ codebook training is deterministic and codes stay in range") {
    val b1 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 8, 16)
    val b2 = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 8, 16)
    assert(b1.length == 8 && b1.forall(_.length == 16))
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
    val codes = emb
      .select(Similarity.pqEncode(Similarity.quantize($"embedding"), b1).as("c"))
      .select(explode($"c")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("pqEncode and adcDist2 match an independent driver-side recomputation") {
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", 8, 16)
    val dsub = books.head.head.length
    val vecs = emb.orderBy($"vec_id").limit(6)
      .select($"vec_id", Similarity.quantize($"embedding").as("vm"))
    val rows = vecs.as[(Long, Seq[Long])].collect()
    // plain-Scala re-implementation of encode + ADC, no Spark expressions
    def enc(v: Seq[Long]): Array[Int] = books.indices.map { m =>
      val sv = v.slice(m * dsub, (m + 1) * dsub)
      books(m).zipWithIndex.map { case (c, j) =>
        val cc = c.map(x => x * x).sum
        val vc = sv.zip(c).map { case (a, b) => a * b }.sum
        (cc - 2 * vc, j)
      }.minBy(s => (s._1, s._2))._2
    }.toArray
    def adc(q: Seq[Long], codes: Array[Int]): Long = books.indices.map { m =>
      val qm = q.slice(m * dsub, (m + 1) * dsub)
      val c = books(m)(codes(m))
      qm.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    val q = rows.head._2
    val sparkOut = vecs
      .select($"vec_id", Similarity.pqEncode($"vm", books).as("codes"))
      .withColumn("adc", Similarity.adcDist2(
        array(q.map(lit(_)): _*), $"codes", books))
      .select($"vec_id", $"codes", $"adc").as[(Long, Seq[Int], Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, vm) <- rows) {
      val expCodes = enc(vm)
      assert(sparkOut(id)._1 == expCodes.toSeq, s"codes mismatch for $id")
      assert(sparkOut(id)._2 == adc(q, expCodes), s"adc mismatch for $id")
    }
  }

  test("ivfPqTopK: k ranked rows per query, ADC ascending, recall sane") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val out = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"adc_dist2", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(!out.exists(r => r._1 == r._2))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pq = out.map(r => (r._1, r._2)).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    // the Scaladoc-documented floor (measured 0.215 at sf0.001 / 0.295
    // at sf0.01 with nprobe = 4)
    assert(recall > 0.15, s"IVF-PQ recall too low: $recall") // coded + probe-limited
  }

  test("ivfSq8TopK: codes in byte range, reconstruction error bounded, recall beats IVF-PQ's floor") {
    val (mn, span) = Similarity.trainSq8Bounds(emb, "vec_id", "embedding")
    assert(mn.length == span.length && span.forall(_ >= 0L))
    // codes stay in [0, 255]; per-dim reconstruction error < span/255 + 1
    val enc = emb.select(Similarity.quantize($"embedding").as("vm"))
      .select($"vm", Similarity.sq8Encode($"vm", mn, span).as("codes"))
      .as[(Seq[Long], Seq[Long])].collect()
    enc.foreach { case (vm, codes) =>
      codes.foreach(c => assert(c >= 0L && c <= 255L))
      vm.indices.foreach { i =>
        val recon255 = 255L * mn(i) + codes(i) * span(i)
        assert(math.abs(255L * vm(i) - recon255) <= span(i) + 255L,
          s"dim $i: vm=${vm(i)} recon255=$recon255 span=${span(i)}")
      }
    }
    val queries = emb.filter($"vec_id" % 25 === 0)
    val out = Similarity.ivfSq8TopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"sq_dist2", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(!out.exists(r => r._1 == r._2))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val sq8 = out.map(r => (r._1, r._2)).toSet
    val recall = (brute & sq8).size.toDouble / brute.size
    assert(recall > 0.15, s"IVF-SQ8 recall too low: $recall")
    // one byte per DIMENSION retains more signal than PQ's one code per
    // 8-dim subspace: same routing, so SQ8 recall must not fall below
    val pq = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val pqRecall = (brute & pq).size.toDouble / brute.size
    assert(recall >= pqRecall - 0.02,
      s"IVF-SQ8 recall $recall fell below IVF-PQ's $pqRecall")
    // determinism under repartition (training stats + routing integer)
    val out2 = Similarity.ivfSq8TopK(queries, emb.repartition(7),
        "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"sq_dist2", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(out.toSet == out2.toSet)
  }

  test("pqSearchRefined recovers the PQ coding loss (recall ≥ plain IVF's floor)") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val idx = Similarity.buildPqIndex(emb, "vec_id", "embedding")
    val raw = Similarity.pqSearchIndex(queries, idx, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val refined = Similarity.pqSearchRefined(queries, idx, emb,
        "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val rawRecall = (brute & raw).size.toDouble / brute.size
    val refRecall = (brute & refined).size.toDouble / brute.size
    // exact re-rank must strictly beat the raw ADC ranking and clear
    // the documented IVF-level floor (measured 0.56 at sf0.001)
    assert(refRecall > rawRecall,
      s"refine did not improve recall: raw=$rawRecall refined=$refRecall")
    assert(refRecall > 0.5, s"refined recall too low: $refRecall")
  }

  test("pqSearchRefined with an exhaustive shortlist EQUALS plain IVF search") {
    // as the shortlist grows past the probed-cell population, the exact
    // re-rank recovers the coding loss ENTIRELY: same routing + exact
    // scoring ⇒ identical (query, neighbor, rank) to ivfSearch with the
    // index's own centroids and the same nprobe
    val queries = emb.filter($"vec_id" % 25 === 0)
    val idx = Similarity.buildPqIndex(emb, "vec_id", "embedding")
    val refined = Similarity.pqSearchRefined(queries, idx, emb,
        "vec_id", "embedding", 10, shortlist = 1000000)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfSearch(queries, emb, "vec_id", "embedding", 10,
        idx.centroids, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(refined == ivf)
    assert(refined.nonEmpty)
  }

  test("stored PQ index: save → load → search ≡ the in-memory index") {
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val queries = emb.filter($"vec_id" % 25 === 0)
    val dir = java.nio.file.Files.createTempDirectory("pq_store").toString
    val built = Similarity.buildPqIndex(corpus, "vec_id", "embedding")
    Similarity.savePqIndex(built, dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    // params survive the round trip bit-exactly
    assert(loaded.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
      built.books.map(_.map(_.toSeq).toSeq).toSeq)
    val served = Similarity.pqSearchIndex(queries, loaded, "vec_id", "embedding", 10)
      .as[(Long, Long, Long, Int)].collect().toSet
    val direct = Similarity.pqSearchIndex(queries, built, "vec_id", "embedding", 10)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(served == direct)
    // at-rest layout is partitioned by cell → probes prune partitions
    val cells = new java.io.File(s"$dir/codes").listFiles()
      .map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length > 1)
  }

  test("K successive PQ appends ≡ one bulk encode; earlier files never touched") {
    // the retrain-offline contract, PQ edition: appends encode with the
    // STORED codebooks only, so N nightly drops land exactly where one
    // combined drop would — drift can only accumulate in quantizer fit
    // (fixed by an offline rebuild), never in the stored codes
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batches = Seq(
      emb.filter($"vec_id" % 30 === 0),
      emb.filter($"vec_id" % 30 === 10),
      emb.filter($"vec_id" % 30 === 20))
    val dir = java.nio.file.Files.createTempDirectory("pq_drift").toString
    Similarity.savePqIndex(
      Similarity.buildPqIndex(corpus, "vec_id", "embedding"), dir)
    for (b <- batches) {
      val before = parquetStamps(s"$dir/codes")
      Similarity.appendPqIndex(spark, dir, b, "vec_id", "embedding")
      val after = parquetStamps(s"$dir/codes")
      before.foreach { case (path, mtime) =>
        assert(after.contains(path), s"append removed $path")
        assert(after(path) == mtime, s"append rewrote $path")
      }
      assert(after.size > before.size, "append must add data files")
    }
    val stored = Similarity.loadPqIndex(spark, dir).codes
      .select($"neighbor_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    // one bulk encode of corpus + all three drops with the SAME quantizers
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", 16)
    val books = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding", 8, 16)
    val all = corpus.unionByName(batches.reduce(_ unionByName _))
    val bulk = all
      .select($"vec_id".as("neighbor_id"),
        Similarity.quantize($"embedding").as("cv"))
      .select($"neighbor_id",
        Similarity.nearestCell($"cv", cents).as("cell"),
        Similarity.pqEncode($"cv", books).as("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(stored == bulk)
    // appended vectors are actually searchable (batch ids appear in a probe)
    val served = Similarity.pqSearchIndex(emb.filter($"vec_id" % 25 === 0),
        Similarity.loadPqIndex(spark, dir), "vec_id", "embedding", 10)
      .select($"neighbor_id").as[Long].collect()
    assert(served.exists(_ % 30 == 0))
  }

  test("multi-probe LSH dominates single-probe per rank and lifts recall vs exact") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" % 25 === 0)
    def byRank(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"cosine")
        .as[(Long, Int, Double)].collect()
        .map { case (q, r, c) => (q, r) -> c }.toMap
    val single = byRank(Similarity.lshTopK(queries, emb,
      "vec_id", "embedding", k = 10))
    val multi = byRank(Similarity.lshTopKMultiProbe(queries, emb,
      "vec_id", "embedding", k = 10))
    // candidates superset ⇒ at every (query, rank) the multi-probe
    // cosine is at least the single-probe one
    single.foreach { case (qr, c) =>
      assert(multi.contains(qr) && multi(qr) >= c - 1e-12,
        s"$qr: multi ${multi.get(qr)} < single $c")
    }
    // and recall@10 vs the exact baseline strictly improves on this data
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", k = 10))
    val rSingle = (hits(Similarity.lshTopK(queries, emb,
      "vec_id", "embedding", k = 10)) & exact).size.toDouble / exact.size
    val rMulti = (hits(Similarity.lshTopKMultiProbe(queries, emb,
      "vec_id", "embedding", k = 10)) & exact).size.toDouble / exact.size
    info(f"recall@10 single=$rSingle%.3f multi=$rMulti%.3f")
    assert(rMulti >= rSingle)
  }

  test("filtered PQ search ranks allowed candidates only; comparisons push into the codes scan") {
    val emb = Tables(spark, sf, "embeddings")
    val idx = Similarity.buildPqIndex(emb, "vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 25 === 0)
    val filtered = Similarity.pqSearchIndex(queries, idx,
        "vec_id", "embedding", k = 5,
        corpusFilter = Some($"neighbor_id" % 2 === 0))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    // reference: the FULL ADC ranking, post-filtered to allowed
    // neighbors, re-ranked — identical only because the filter ran
    // BEFORE the k cutoff on the operator side
    val all = Similarity.pqSearchIndex(queries, idx,
        "vec_id", "embedding", k = Int.MaxValue)
      .select($"query_id", $"neighbor_id", $"adc_dist2")
      .as[(Long, Long, Long)].collect()
    val want = all.filter(_._2 % 2 == 0).groupBy(_._1).toSeq.flatMap {
      case (q, rs) => rs.sortBy(r => (r._3, r._2)).take(5).zipWithIndex
        .map { case (r, i) => (q, r._2, i + 1) }
    }.toSet
    assert(filtered == want && filtered.nonEmpty)
    // a k-limited-then-filtered result would be a strict subset when the
    // filter bites inside some query's raw top-5
    val postFiltered = Similarity.pqSearchIndex(queries, idx,
        "vec_id", "embedding", k = 5)
      .filter($"neighbor_id" % 2 === 0)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(postFiltered.size < filtered.size,
      "fixture must exercise the filter inside raw top-k")
    // plain comparison predicates reach the LOADED codes scan as pushed
    // parquet filters
    val dir = java.nio.file.Files.createTempDirectory("pq_filter").toString
    Similarity.savePqIndex(idx, dir)
    val plan = Similarity.pqSearchIndex(queries,
        Similarity.loadPqIndex(spark, dir), "vec_id", "embedding", k = 5,
        corpusFilter = Some($"neighbor_id" <= 100L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(neighbor_id), LessThanOrEqual(neighbor_id,100)")
      || plan.contains("LessThanOrEqual(neighbor_id,100)"), plan.take(3000))
  }

  test("pqCodingError: flat for in-distribution appends, rises for shifted batches") {
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("pq_stale").toString
    Similarity.savePqIndex(
      Similarity.buildPqIndex(corpus, "vec_id", "embedding"), dir)
    def err(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) =
      Similarity.pqCodingError(spark, dir, df, "vec_id", "embedding")
        .as[(Long, Long, Long)].head()
    val base = err(corpus)
    val inDist = err(batch)
    // deterministic exact-integer report
    assert(err(batch) == inDist)
    assert(inDist._1 > 0 && base._3 > 0)
    // in-distribution: same synthetic cloud, coding error stays in the
    // corpus's own band
    assert(inDist._3 < 2 * base._3,
      s"in-distribution mean ${inDist._3} vs corpus ${base._3}")
    // shifted distribution: every coordinate pushed far off the trained
    // cloud — the metric must scream
    val shifted = batch.withColumn("embedding",
      expr("transform(embedding, x -> x * CAST(3.0 AS FLOAT) + CAST(2.0 AS FLOAT))"))
    val drift = err(shifted)
    assert(drift._3 > 4 * base._3,
      s"shifted mean ${drift._3} not above 4x corpus ${base._3}")
    // the reported append writes the ledger row without touching the
    // metric's inputs: K reported appends = K rows, codes still serve
    Similarity.appendPqIndexReported(spark, dir, batch, "vec_id", "embedding")
    Similarity.appendPqIndexReported(spark, dir,
      shifted.withColumn("vec_id", $"vec_id" + 1000000L), "vec_id", "embedding")
    val ledger = spark.read.parquet(s"$dir/coding_error")
      .as[(Long, Long, Long)].collect().toSeq
    assert(ledger.size == 2)
    assert(ledger.map(_._3).max > 4 * base._3 &&
      ledger.map(_._3).min < 2 * base._3)
  }

  test("semanticContamination: exact hits, hit counts, and the " +
      "closest-eval tie-break on eval id") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val evalSet = Seq((100L, v(1.0, 0.0)), (101L, v(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, v(1.0, 0.1)),   // cos(e100) ≈ 0.995, cos(e101) ≈ 0.0995
      (2L, v(0.7, 0.7)),   // cos ≡ for BOTH evals → exact tie
      (3L, v(-1.0, -1.0)), // negative cosines — unflagged
      (4L, v(0.0, 1.0)))   // identical to e101 → cosine 1.0
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, evalSet,
        "vec_id", "embedding", tau = 0.5)
      .select($"corpus_id", $"n_eval_hits", $"best_eval_id", $"best_cosine")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L)._2 == 1L && out(1L)._3 == 100L)
    // the exact tie (identical cosine to both evals) breaks on the
    // SMALLER eval id — the (cosine DESC, eval_id ASC) contract
    assert(out(2L)._2 == 2L && out(2L)._3 == 100L)
    assert(out(4L)._2 == 1L && out(4L)._3 == 101L &&
      math.abs(out(4L)._4 - 1.0) < 1e-12)
    // below-threshold corpus rows never appear (no zero-hit rows)
    assert(!out.contains(3L))
    // the fixture-free law at data scale: every flagged doc's best hit
    // clears tau, and flagging agrees with an independent exact filter
    val emb = Tables(spark, sf, "embeddings")
    val ev = emb.filter($"vec_id" % 25 === 0)
    val co = emb.filter($"vec_id" % 25 =!= 0)
    val flagged = Similarity.semanticContamination(co, ev,
      "vec_id", "embedding", tau = 0.30)
    assert(flagged.filter($"best_cosine" < 0.30).count() == 0)
    val viaBrute = Similarity.bruteForceTopK(ev, emb, "vec_id", "embedding",
        k = emb.count().toInt)
      .filter($"cosine" >= 0.30 && $"neighbor_id" % 25 =!= 0)
      .select($"neighbor_id").distinct()
      .as[Long].collect().toSet
    val viaOp = flagged.select($"corpus_id").as[Long].collect().toSet
    assert(viaOp == viaBrute)
  }
}
