package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("jacobi recovers a known eigensystem (A v = λ v, orthonormal V)") {
    val a = Array(
      Array(4.0, 1.0, 0.0),
      Array(1.0, 3.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (vals, vecs) = Pca.jacobi(a)
    // residual per eigenpair
    for (c <- 0 until 3) {
      val v = Array.tabulate(3)(k => vecs(k)(c))
      val av = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * v(j)).sum)
      val res = (0 until 3).map(i => math.abs(av(i) - vals(c) * v(i))).max
      assert(res < 1e-9, s"eigenpair $c residual $res")
    }
    // orthonormal columns
    for (c1 <- 0 until 3; c2 <- c1 until 3) {
      val dot = (0 until 3).map(k => vecs(k)(c1) * vecs(k)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9)
    }
    // trace preserved
    assert(math.abs(vals.sum - 9.0) < 1e-9)
  }

  test("fit: eigenvalues descend, basis rows near-orthogonal, deterministic") {
    val m1 = Pca.fit(emb, "embedding", r = 8)
    val m2 = Pca.fit(emb, "embedding", r = 8)
    assert(m1.meanMilli.toSeq == m2.meanMilli.toSeq)
    assert(m1.basisMicro.map(_.toSeq).toSeq == m2.basisMicro.map(_.toSeq).toSeq)
    assert(m1.eigvals.sliding(2).forall(p => p.head >= p.last - 1e-12))
    for (i <- m1.basisMicro.indices; j <- i + 1 until m1.basisMicro.length) {
      val dot = m1.basisMicro(i).zip(m1.basisMicro(j))
        .map { case (x, y) => x.toDouble * y }.sum / 1e12
      assert(math.abs(dot) < 1e-3, s"basis rows $i,$j dot $dot")
    }
  }

  test("rank-1 data: first component captures everything, second eigenvalue ~ 0") {
    val base = Seq(3.0f, -4.0f, 0.0f, 0.0f)
    val rows = (1 to 40).map(i => (i.toLong, base.map(_ * i)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", r = 2)
    assert(m.eigvals(0) > 1e3)
    assert(math.abs(m.eigvals(1)) < 1e-3 * m.eigvals(0))
    // p1 of every point ~ 0 relative to p0 spread
    val proj = Pca.project(df, "vec_id", "embedding", m)
      .as[(Long, Long, Long)].collect()
    val p0spread = proj.map(_._2).max - proj.map(_._2).min
    assert(proj.map(r => math.abs(r._3)).max < 0.01 * p0spread)
  }

  test("momentsOf: K slice moments merged equal the bulk pass; fitFromMoments ≡ fit") {
    def summed(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"i", $"j").agg(sum($"v").as("v"))
        .as[(Int, Int, Long)].collect().toSet
    val bulk = summed(Pca.momentsOf(emb, "embedding"))
    val merged = summed(
      Pca.momentsOf(emb.filter($"vec_id" % 3 === 0), "embedding")
        .unionByName(Pca.momentsOf(emb.filter($"vec_id" % 3 === 1), "embedding"))
        .unionByName(Pca.momentsOf(emb.filter($"vec_id" % 3 === 2), "embedding")))
    assert(merged == bulk && bulk.nonEmpty)
    val m1 = Pca.fit(emb, "embedding", r = 4)
    val m2 = Pca.fitFromMoments(
      Pca.momentsOf(emb.filter($"vec_id" % 3 === 0), "embedding")
        .unionByName(Pca.momentsOf(emb.filter($"vec_id" % 3 =!= 0), "embedding")),
      r = 4)
    assert(m1.meanMilli.toSeq == m2.meanMilli.toSeq)
    assert(m1.basisMicro.map(_.toSeq).toSeq == m2.basisMicro.map(_.toSeq).toSeq)
  }

  test("moments stream: replayed trigger overwrites identically; live fit ≡ bulk fit") {
    import graft.streaming.DocumentStreams
    val base = java.nio.file.Files.createTempDirectory("moments_ingest").toString
    val seedPath = s"$base/seed"; val out = s"$base/out"
    Pca.momentsOf(emb.filter($"vec_id" % 10 =!= 0), "embedding")
      .write.mode("overwrite").parquet(seedPath)
    DocumentStreams.momentsIngestBatch(spark, out)(
      emb.filter($"vec_id" % 10 === 0), 0L)
    val before = spark.read.parquet(s"$out/batch_id=0").collect().toSet
    DocumentStreams.momentsIngestBatch(spark, out)(
      emb.filter($"vec_id" % 10 === 0), 0L)
    assert(spark.read.parquet(s"$out/batch_id=0").collect().toSet == before)
    val live = Pca.fitFromMoments(
      DocumentStreams.liveMoments(spark, seedPath, out), r = 4)
    val bulk = Pca.fit(emb, "embedding", r = 4)
    assert(live.meanMilli.toSeq == bulk.meanMilli.toSeq)
    assert(live.basisMicro.map(_.toSeq).toSeq ==
      bulk.basisMicro.map(_.toSeq).toSeq)
  }

  test("projection is invariant under repartitioning and sorted by variance") {
    val m = Pca.fit(emb, "embedding", r = 4)
    val a = Pca.project(emb, "vec_id", "embedding", m)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = Pca.project(emb.repartition(13), "vec_id", "embedding", m)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    // sample variance of projected coords decreases with component rank
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val rows = a.toSeq
    val vs = Seq(rows.map(_._2.toDouble), rows.map(_._3.toDouble),
      rows.map(_._4.toDouble), rows.map(_._5.toDouble)).map(variance)
    assert(vs.sliding(2).forall(p => p.head >= p.last * 0.999),
      s"projected variances not descending: $vs")
  }

  test("rotateForPq: quantize round-trips losslessly, pairwise L2 " +
      "geometry survives the full-rank rotation, balance permutes") {
    import graft.operators.Similarity
    val sample = emb.filter($"vec_id" < 40).localCheckpoint()
    val d = sample.select(size($"embedding")).head().getInt(0)
    val model = Pca.fit(sample, "embedding", r = d)
    def milliRows(balance: Int): Map[Long, Seq[Long]] =
      sample.select($"vec_id",
          Similarity.quantize(Pca.rotateForPq($"embedding", model, balance))
            .as("vm"))
        .as[(Long, Seq[Long])].collect().toMap
    val rot = milliRows(1)
    // lossless round-trip: quantize recovers EXACTLY the floor-divided
    // integers (the rotated array is exact-integer-over-1000 doubles),
    // so the whole PQ stack consumes the rotation bit-reproducibly
    val viaDouble = sample.select($"vec_id",
        Pca.rotateForPq($"embedding", model, 1).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    for ((id, r) <- viaDouble; (x, i) <- r.zipWithIndex)
      assert(math.round(x * 1000) == rot(id)(i), s"vec $id dim $i")
    // orthonormal basis ⇒ pairwise squared L2 preserved up to the
    // 1-milli/dim rounding (basis rows are micro-rounded and each
    // coordinate floors once, so allow a ~d·|x|-scaled slack)
    val orig = sample.select($"vec_id",
        Similarity.quantize($"embedding").as("vm"))
      .as[(Long, Seq[Long])].collect().toMap
    def d2(m: Map[Long, Seq[Long]], a: Long, b: Long): Double =
      m(a).zip(m(b)).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(10)
    for (a <- ids; b <- ids if a < b) {
      val o = d2(orig, a, b); val r = d2(rot, a, b)
      assert(math.abs(o - r) <= 0.02 * o + 4 * d,
        s"pair ($a,$b): orig d2=$o rotated d2=$r")
    }
    // balance=8 is a PERMUTATION of the balance=1 coordinates per row
    val bal = milliRows(8)
    for (id <- ids)
      assert(bal(id).sorted == rot(id).sorted, s"vec $id")
    assert(bal(ids.head) != rot(ids.head),
      "balance=8 did not reorder the components")
  }
}
