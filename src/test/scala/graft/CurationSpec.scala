package graft

import graft.operators.{Curation, Layout}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "a quick brown fox jumps over a sleeping cat", "en"),
    (3L, "completely different words in this one here now", "en"),
    (4L, "der schnelle braune fuchs springt sehr hoch heute", "de"),
    (5L, "the quick brown fox sat still all day", "en")
  ).toDF("doc_id", "text", "lang")

  test("decontaminate drops exactly the docs sharing an n-gram with the benchmark") {
    val bench = docs.filter($"doc_id" === 1L)
    val corpus = docs.filter($"doc_id" =!= 1L)
    val clean = Curation.decontaminate(corpus, bench, "doc_id", "text", 3)
    // doc 2 shares "brown fox jumps"+"fox jumps over", doc 5 shares
    // "the quick brown"+"quick brown fox"; docs 3 and 4 share nothing
    assert(clean.select($"doc_id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("decontaminate with an empty benchmark keeps the whole corpus") {
    val clean = Curation.decontaminate(docs, docs.limit(0), "doc_id", "text", 3)
    assert(clean.count() == docs.count())
  }

  test("kmvDistinct is exact below k and within tolerance above k") {
    val df = (0 until 1000).map(i => ("big", s"val$i")) ++
      (0 until 5).map(i => ("small", s"v$i"))
    val out = Curation.kmvDistinct(df.toDF("g", "v"), Seq("g"), $"v", k = 64)
      .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
    assert(out("small") == 5.0) // below k: exact count
    // KMV with k=64 has relative stddev ~ 1/sqrt(k-2) ≈ 12.7%; allow 4σ
    assert(math.abs(out("big") - 1000.0) / 1000.0 < 0.5,
      s"estimate ${out("big")} too far from 1000")
  }

  test("kmvDistinct ignores duplicate keys") {
    val df = (0 until 50).flatMap(i => Seq.fill(10)(("g", s"v$i")))
    val out = Curation.kmvDistinct(df.toDF("g", "v"), Seq("g"), $"v", k = 64)
    assert(out.select($"est_distinct").as[Double].head() == 50.0)
  }

  test("chunk covers every token exactly and ids are dense") {
    val out = Curation.chunk(docs, "doc_id", "text", width = 4, stride = 3)
      .collect()
    // 8-9 token docs, stride 3: starts 0,3,6 -> 3 chunks each
    assert(out.length == 15)
    val doc1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(doc1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    // 9 tokens: windows at 0..3, 3..6, 6..8 -> last is truncated to 3
    assert(doc1.map(_.getLong(2)).toSeq == Seq(4L, 4L, 3L))
  }

  test("chunk of a short doc yields one truncated window") {
    val one = Seq((9L, "hi there", "en")).toDF("doc_id", "text", "lang")
    val out = Curation.chunk(one, "doc_id", "text", width = 32, stride = 24).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }

  test("packShards conserves tokens and shard ids are dense per stratum") {
    val out = Curation.packShards(docs, "lang", "doc_id",
      size(split($"text", " ")), budget = 10)
    val rows = out.select($"lang", $"shard", $"n_docs", $"tok_sum")
      .as[(String, Long, Long, Long)].collect()
    val totalTok = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(rows.map(_._4).sum == totalTok) // every token lands in a shard
    assert(rows.map(_._3).sum == docs.count()) // every doc in exactly one shard
    for ((lang, group) <- rows.groupBy(_._1)) {
      val shards = group.map(_._2).sorted.toSeq
      assert(shards == (0L until shards.size).toSeq, s"$lang shards not dense")
    }
  }

  test("mixByEpochs replicates per the epoch map and drops zero-epoch strata") {
    val out = Curation.mixByEpochs(docs, "doc_id", "lang",
      Map("en" -> 2, "de" -> 0), defaultEpochs = 1)
    val counts = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts.get("de").isEmpty) // dropped
    assert(counts("en") == 8L) // 4 en docs x 2 epochs
    // replicas are distinguishable and deterministic
    assert(out.select($"mix_key").distinct().count() == out.count())
    val again = Curation.mixByEpochs(docs, "doc_id", "lang",
      Map("en" -> 2, "de" -> 0), defaultEpochs = 1)
    assert(again.select($"mix_key").as[String].collect().sorted.toSeq ==
      out.select($"mix_key").as[String].collect().sorted.toSeq)
  }

  test("zOrder2 is an exact bit interleave (round-trips both inputs)") {
    val pts = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val out = pts.toDF("x", "y")
      .withColumn("z", Layout.zOrder2($"x", $"y", 5))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- out) {
      var (dx, dy) = (0L, 0L)
      for (i <- 0 until 5) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((dx, dy) == (x, y), s"z=$z did not round-trip ($x,$y)")
    }
  }

  test("writeZOrdered produces files with disjoint z-ranges") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    Layout.writeZOrdered(pts.toDF("x", "y"), dir, $"x", $"y", bits = 6,
      numFiles = 4)
    val back = spark.read.parquet(dir)
      .withColumn("z", Layout.zOrder2($"x", $"y", 6))
      .withColumn("f", input_file_name())
    assert(back.count() == 64 * 64) // lossless
    val ranges = back.groupBy($"f")
      .agg(min($"z").as("lo"), max($"z").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length > 1)
    for (w <- ranges.sliding(2) if w.length == 2)
      assert(w(0)._2 < w(1)._1, "file z-ranges overlap: clustering is broken")
  }

  test("repetitionStats flags the looping doc and not the varied one") {
    val corpus = Seq(
      (1L, "spam ham spam ham spam ham spam ham spam ham"), // one bigram loop
      (2L, "every word here is fully distinct from others")
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(corpus, "doc_id", "text", n = 2)
      .select($"doc_id", $"n_grams", $"top_gram_frac", $"dup_gram_frac",
        $"is_repetitive")
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 9 bigrams = 5×"spam ham" + 4×"ham spam" → top 5/9, dup 7/9
    assert(out(1L)._2 == 9L && out(1L)._3 == 5.0 / 9 && out(1L)._4 == 7.0 / 9)
    assert(out(1L)._5)
    // doc 2: 7 distinct bigrams → top 1/7, dup 0
    assert(out(2L)._3 == 1.0 / 7 && out(2L)._4 == 0.0 && !out(2L)._5)
  }

  test("repetitionStats omits docs shorter than n tokens") {
    val corpus = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val ids = Curation.repetitionStats(corpus, "doc_id", "text", n = 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("dupNgramStats scores cross-doc shared spans, not self-repeats") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val corpus = Seq(
      (1L, shared + " unique1 unique2 unique3"),
      (2L, shared + " other4 other5 other6"),
      (3L, "wholly disjoint text with eight distinct little words")
    ).toDF("doc_id", "text")
    val out = Curation.dupNgramStats(corpus, "doc_id", "text", n = 8)
      .select($"doc_id", $"n_grams", $"n_dup", $"is_dup_heavy")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // docs 1/2: 11 words → 4 8-grams each; only the full `shared` gram
    // (positions 1) occurs in both docs
    assert(out(1L)._2 == 4L && out(1L)._3 == 1L)
    assert(out(2L)._2 == 4L && out(2L)._3 == 1L)
    assert(out(3L)._3 == 0L && !out(3L)._4)
  }

  test("mixWeights: exact counts, share sums to 1, weights flatten the skew") {
    val corpus = (1 to 90).map(i => (i.toLong, "w " * 10 + "end", "en", "web")) ++
      (91 to 100).map(i => (i.toLong, "w " * 10 + "end", "fr", "book"))
    val out = Curation.mixWeights(corpus.toDF("doc_id", "text", "lang", "source"),
        Seq("lang", "source"), graft.functions.TextAnalysis.tokenCount($"text"))
      .select($"lang", $"n_docs", $"n_tokens", $"token_share", $"temp_weight")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("en")._2 == 90L && out("fr")._2 == 10L)
    assert(out("en")._4 == 0.9 && out("fr")._4 == 0.1)
    // temperature 0.5 flattens: weight ratio sqrt(9) = 3, not 9
    assert(math.abs(out("en")._5 / out("fr")._5 - 3.0) < 1e-12)
  }

  test("lengthStrata: ntile bands are equal-count and length-ordered") {
    val corpus = (1 to 8).map(i => (i.toLong, ("w " * i).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.lengthStrata(corpus, "lang", "doc_id",
        graft.functions.TextAnalysis.tokenCount($"text"), tiles = 4)
      .orderBy($"tile")
      .select($"tile", $"n_docs", $"tok_min", $"tok_max")
      .as[(Int, Long, Long, Long)].collect()
    // 8 docs of 1..8 tokens into 4 tiles: (1,2)(3,4)(5,6)(7,8)
    assert(out.toSeq == Seq((1, 2L, 1L, 2L), (2, 2L, 3L, 4L),
      (3, 2L, 5L, 6L), (4, 2L, 7L, 8L)))
  }

  test("clusterAwareSplit never lets a near-dup cluster straddle splits") {
    import graft.operators.Dedup
    val docs = Tables(spark, sf, "documents")
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text")
      .select($"id_a", $"id_b")
    assert(pairs.count() > 0, "need real clusters for this property")
    val split = Curation.clusterAwareSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"split")
    // every paired doc shares its split with its twin — zero straddles
    val straddles = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "s_a"), Seq("id_a"))
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "s_b"), Seq("id_b"))
      .filter($"s_a" =!= $"s_b").count()
    assert(straddles == 0L)
    // split covers every doc exactly once and all three labels exist
    assert(split.count() == docs.count())
    val labels = split.select($"split").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("train", "val", "test")) && labels.contains("train"))
    // invalid fractions fail loudly
    intercept[IllegalArgumentException] {
      Curation.clusterAwareSplit(docs, "doc_id", pairs, trainPct = 96, valPct = 5)
    }
  }

  test("concentration: HHI is 1 for one source, 1/k for k equal sources") {
    val corpus = ((1 to 10).map(i => (i.toLong, "en", "only")) ++
      (1 to 12).map(i => (100L + i, "fr", s"s${i % 4}")))
      .toDF("doc_id", "lang", "source")
    val out = Curation.concentration(corpus, "lang", "source")
      .select($"lang", $"n_items", $"n_rows", $"hhi")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("en") == (("en", 1L, 10L, 1.0)))
    assert(out("fr")._2 == 4L && out("fr")._3 == 12L)
    assert(math.abs(out("fr")._4 - 0.25) < 1e-15) // 4 × (3/12)²
  }

  test("sourceQuota keeps the cap-best docs per source, priority respected") {
    // source a: 5 docs scores 10..50, source b: 2 docs — cap 3 binds
    // only a, keeping the 3 highest scores (ties impossible here)
    val docs = (Seq((1L, "a", 10), (2L, "a", 50), (3L, "a", 30),
      (4L, "a", 40), (5L, "a", 20), (6L, "b", 9), (7L, "b", 8)))
      .toDF("doc_id", "source", "score")
    val kept = Curation.sourceQuota(docs, "source", "doc_id", $"score", 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 6L, 7L))
    // score ties break on the SMALLER doc_id (deterministic kept set)
    val tied = Seq((1L, "a", 7), (2L, "a", 7), (3L, "a", 7))
      .toDF("doc_id", "source", "score")
    val keptTied = Curation.sourceQuota(tied, "source", "doc_id", $"score", 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptTied == Set(1L, 2L))
  }

  test("trainOrderShuffle: contiguous positions per shard, repartition-stable") {
    val docs = Tables(spark, sf, "documents")
    val out = Curation.trainOrderShuffle(docs, "doc_id", nShards = 8)
      .select($"shard", $"position", $"doc_id")
      .as[(Int, Int, Long)].collect()
    assert(out.length == docs.count())
    // every shard's positions are exactly 1..n (a dense training order)
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length).toSeq)
    }
    // the assignment is a pure function of the id — any input
    // partitioning produces the identical order
    val re = Curation.trainOrderShuffle(docs.repartition(7), "doc_id", 8)
      .select($"shard", $"position", $"doc_id")
      .as[(Int, Int, Long)].collect()
    assert(re.sortBy(_._3).toSeq == out.sortBy(_._3).toSeq)
  }

  test("weightedSample: weight-0 never, weight-1e6 always, partition-invariant, monotone") {
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
    assert(Curation.weightedSample(docs, "doc_id", lit(0L)).count() == 0)
    assert(Curation.weightedSample(docs, "doc_id", lit(1000000L)).count()
      == docs.count())
    val half = Curation.weightedSample(docs, "doc_id", lit(500000L))
      .select($"doc_id").as[Long].collect().toSet
    val rep = Curation.weightedSample(docs.repartition(13), "doc_id",
        lit(500000L)).select($"doc_id").as[Long].collect().toSet
    assert(half == rep && half.nonEmpty)
    // monotone in the weight: a smaller weight keeps a subset
    val q = Curation.weightedSample(docs, "doc_id", lit(250000L))
      .select($"doc_id").as[Long].collect().toSet
    assert(q.subsetOf(half))
    // roughly proportional inclusion (md5 uniformity sanity)
    val n = docs.count().toDouble
    assert(math.abs(half.size / n - 0.5) < 0.1)
  }

  test("stripDupSpans: shared spans cut, unique tails survive, all-dup doc empties") {
    val pre = "one two three four five six seven eight" // 8 shared tokens
    val docs = Seq(
      (1L, s"$pre alpha beta gamma delta"),
      (2L, s"$pre epsilon zeta eta theta"),
      (3L, "totally unique document with no shared eight gram anywhere"),
      (4L, pre) // nothing but the boilerplate
    ).toDF("doc_id", "text")
    val got = Curation.stripDupSpans(docs, "doc_id", "text", n = 8, maxDf = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((12L, 4L, "alpha beta gamma delta")))
    assert(got(2L) == ((12L, 4L, "epsilon zeta eta theta")))
    assert(got(3L) == ((9L, 9L, "totally unique document with no shared eight gram anywhere")))
    assert(got(4L) == ((8L, 0L, "")))
    // n_kept always equals the cleaned token count
    got.values.foreach { case (_, k, c) =>
      assert(k == (if (c.isEmpty) 0 else c.split(" ").length))
    }
  }

  test("cmSketch: partial merges ≡ bulk; estimates dominate true counts") {
    val docs = Tables(spark, sf, "documents")
      .select($"source", explode(split($"text", " ")).as("token"))
    val bulk = Curation.cmSketch(docs, "token")
      .cells.as[(Int, Int, Long)].collect().toSet
    // one partial sketch per source, merged by union + re-sum
    val sources = docs.select($"source").distinct().as[String].collect()
    val merged = sources.map(s =>
        Curation.cmSketch(docs.filter($"source" === s), "token").cells)
      .reduce(_ unionByName _)
      .groupBy($"r", $"c").agg(sum($"n").as("n"))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == bulk && bulk.nonEmpty)
    // count-min guarantee: estimate >= true occurrence count, per token
    val truth = docs.groupBy($"token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val probe = docs.select($"token").distinct().limit(200)
    val est = Curation.cmEstimate(Curation.cmSketch(docs, "token"),
        probe, "token")
      .as[(String, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (tok, e) =>
      assert(e >= truth(tok), s"$tok: est $e < true ${truth(tok)}")
    }
  }

  test("goodTuringBigrams: hand-checked spectrum and integer discounts") {
    val docs = Seq(
      ("en", "a b a b c"),      // bigrams: "a b"×2, "b a", "b c"
      ("en", "x"),              // single token: zero bigrams
      ("de", "k k k")           // "k k"×2
    ).toDF("lang", "text")
    val got = Curation.goodTuringBigrams(docs, "lang", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    // en: r=1 n_r=2 (b a, b c), r*=(2·N2/N1)=2·1/2 → 1.0; r=2 n_r=1, N3=0 → 0
    // de: r=2 n_r=1 ("k k"), N3=0 → 0
    assert(got == Set(
      ("en", 1L, 2L, 1000000L),
      ("en", 2L, 1L, 0L),
      ("de", 2L, 1L, 0L)))
  }

  test("logHistSketch: K partial merges ≡ bulk build; estimates honor the factor-2 bound") {
    val docs = Tables(spark, sf, "documents")
      .select($"lang", $"source",
        graft.functions.TextAnalysis.tokenCount($"text").cast("long").as("tok"))
    val bulk = Curation.logHistSketch(docs, Seq("lang"), "tok")
      .as[(String, Int, Long)].collect().toSet
    // build one partial sketch per source, merge by union + re-sum —
    // the mergeability contract (bucket counts are additive)
    val sources = docs.select($"source").distinct().as[String].collect()
    val partials = sources.map(s =>
      Curation.logHistSketch(docs.filter($"source" === s), Seq("lang"), "tok"))
    val merged = partials.reduce(_ unionByName _)
      .groupBy($"lang", $"bucket").agg(sum($"n").as("n"))
      .as[(String, Int, Long)].collect().toSet
    assert(merged == bulk && bulk.nonEmpty)
    // estimates: for each lang, est(q) = 2^b - 1 must bracket the exact
    // rank statistic x as x <= est < 2x (x >= 1 here: docs have tokens)
    val est = Curation.logHistQuantiles(
        Curation.logHistSketch(docs, Seq("lang"), "tok"), Seq("lang"),
        Seq(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)))
      .as[(String, Long, Long, Long, Long)].collect()
    val byLang = docs.as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).sorted }
    for ((lang, n, p10, p50, p90) <- est) {
      val xs = byLang(lang)
      assert(n == xs.length)
      for ((estV, num, den) <- Seq((p10, 1, 10), (p50, 1, 2), (p90, 9, 10))) {
        val x = xs((num * xs.length + den - 1) / den - 1) // exact rank stat
        assert(x <= estV && estV < 2 * x,
          s"$lang: est $estV outside [$x, ${2 * x})")
      }
    }
  }

  test("tokenBudgetMix draws per-group hash-order prefixes within budget, extensibly") {
    val rows = Seq(
      (1L, "a", 30L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 30L),
      (10L, "b", 50L), (11L, "b", 50L), (12L, "b", 500L))
      .toDF("doc_id", "source", "tok")
    val got = Curation.tokenBudgetMix(rows, "doc_id", "source", "tok", 100L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._4)).toSet
    // reference: same md5 order, driver-side
    def draw(budget: Long): Set[(Long, String, Long)] = {
      val byGroup = rows.as[(Long, String, Long)].collect()
        .groupBy(_._2)
      byGroup.toSeq.flatMap { case (_, rs) =>
        val ordered = rs.toSeq.sortBy { case (id, _, _) =>
          (java.lang.Long.parseLong(
            java.security.MessageDigest.getInstance("MD5")
              .digest(s"mix:$id".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString.take(15), 16) % 1000000L, id)
        }
        ordered.scanLeft((0L, "", 0L, 0L)) { case ((_, _, _, cum), (id, s2, tk)) =>
          (id, s2, tk, cum + tk)
        }.drop(1).takeWhile(_._4 <= budget)
          .map { case (id, s2, _, cum) => (id, s2, cum) }
      }.toSet
    }
    assert(got == draw(100L) && got.nonEmpty)
    // per-group budget: every group's kept sum is within budget
    got.groupBy(_._2).foreach { case (_, ks) =>
      assert(ks.map(_._3).max <= 100L)
    }
    // a larger budget EXTENDS the draw (prefix property), never resamples
    val bigger = Curation.tokenBudgetMix(rows, "doc_id", "source", "tok", 160L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._4)).toSet
    assert(got.subsetOf(bigger) && bigger.size > got.size)
  }

  test("robustOutlierGate flags beyond n MADs of the group median, robust to the tail") {
    // group g: values 10×100 and one 1000 — median 100, MAD 0: the
    // outlier is flagged (|1000-100| > n·0) and the bulk is not
    val g = (1L to 10L).map(i => (i, "g", 100L)) :+ (99L, "g", 1000L)
    // group h: symmetric spread, MAD 10 — only ±>2 MADs flag
    val h = Seq((201L, "h", 80L), (202L, "h", 90L), (203L, "h", 100L),
      (204L, "h", 110L), (205L, "h", 120L), (206L, "h", 145L))
    val df = (g ++ h).toDF("doc_id", "source", "tok")
    val out = Curation.robustOutlierGate(df, "source", "tok", nMads = 2)
      .select($"doc_id").as[Long].collect().toSet
    // h: median 105, deviations (25,15,5,5,15,40) → mad 15; cut 30 → 145 flags (40)
    assert(out == Set(99L, 206L))
    // a 3-MAD gate keeps 206 (40 <= 45)
    val strict = Curation.robustOutlierGate(df, "source", "tok", nMads = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(strict == Set(99L))
  }

  test("kmvJaccard: exact when k covers the union; u_n bounded by k; all pairs emitted") {
    // three groups over a 30-key universe with known overlaps
    val rows =
      (1 to 20).map(i => ("a", s"key$i")) ++
      (11 to 30).map(i => ("b", s"key$i")) ++   // |a∩b|=10, |a∪b|=30
      (1 to 5).map(i => ("c", s"key$i"))        // |a∩c|=5, |b∩c|=0
    val df = rows.toDF("g", "k")
    // k ≥ any union size ⇒ sketches are complete sets ⇒ estimates exact
    val exact = Curation.kmvJaccard(
        Curation.kmvSketch(df, Seq("g"), $"k", 64), "g", 64)
      .select($"g_a", $"g_b", $"u_n", $"inter_n", $"jaccard_micro")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(exact.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(exact(("a", "b")) == ((30L, 10L, 10L * 1000000L / 30L)))
    assert(exact(("a", "c")) == ((20L, 5L, 250000L)))
    assert(exact(("b", "c")) == ((25L, 0L, 0L)))
    // small k: u_n capped at k, estimate still a valid ratio in [0, 1e6]
    val capped = Curation.kmvJaccard(
        Curation.kmvSketch(df, Seq("g"), $"k", 8), "g", 8)
      .select($"u_n", $"inter_n", $"jaccard_micro")
      .as[(Long, Long, Long)].collect()
    assert(capped.length == 3)
    capped.foreach { case (u, i, j) =>
      assert(u <= 8 && i <= u && j >= 0 && j <= 1000000L)
    }
  }

  test("heavyHitters: underestimates within N/(k+1); heavy items always present; exact when k covers") {
    val tok = Tables(spark, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
    val truth = tok.groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val k = 10
    val hh = Curation.heavyHitters(tok, "tok", $"doc_id", k, nSlices = 4)
      .as[(String, Long)].collect().toMap
    assert(hh.nonEmpty && hh.size <= k)
    val bound = n / (k + 1)
    hh.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overestimated")
    }
    truth.foreach { case (item, c) =>
      assert(c - hh.getOrElse(item, 0L) <= bound,
        s"$item error beyond N/(k+1)")
    }
    val heavy = truth.filter(_._2 > bound).keySet
    assert(heavy.subsetOf(hh.keySet), "a heavy item is missing")
    // k covering every distinct item per slice and globally ⇒ exact
    val all = Curation.heavyHitters(tok, "tok", $"doc_id",
      k = truth.size, nSlices = 4).as[(String, Long)].collect().toMap
    assert(all == truth)
  }

  test("contaminationFraction: exact shares; positives ≡ the binary rule") {
    val corpus = Seq((1L, "a b c d e"), (2L, "x y z w"), (3L, "a b"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e f")).toDF("doc_id", "text")
    val got = Curation.contaminationFraction(corpus, bench, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1 grams {a b c, b c d, c d e}: 2 of 3 in bench {b c d, c d e, d e f}
    assert(got.keySet == Set(1L, 2L), "gram-less doc absent")
    assert(got(1L) == ((3L, 2L, 2000000L / 3L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    val binary = Curation.contaminatedIds(corpus, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    assert(got.filter(_._2._2 > 0).keySet == binary)
  }

  test("bigramSurprisal: hand-checked bits, prefix-normalized, short docs absent") {
    // corpus bigram counts: doc1 "a a"×3; doc2 "a b"×2, "b a"×1
    // prefix counts: a → 5, b → 1
    // bits("a a") = len(bin 5) − len(bin 3) = 3 − 2 = 1
    // bits("a b") = len(bin 5) − len(bin 2) = 3 − 2 = 1
    // bits("b a") = len(bin 1) − len(bin 1) = 0
    val df = Seq((1L, "a a a a"), (2L, "a b a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = Curation.bigramSurprisal(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L), "single-token doc has no bigrams")
    assert(got(1L) == ((3L, 3L, 1000000L)))
    assert(got(2L) == ((3L, 2L, 2000000L / 3L)))
  }

  test("kmvSketch merges: k-min of unioned slice sketches ≡ bulk sketch") {
    val docs = Tables(spark, sf, "documents")
      .select($"source", explode(split($"text", " ")).as("tok"))
    def sk(df: org.apache.spark.sql.DataFrame) =
      Curation.kmvSketch(df, Seq("source"), $"tok", 16)
    val bulk = sk(docs).as[(String, Long)].collect().toSet
    // slice sketches union → re-sketch (rank the union's hashes) — the
    // mergeability kmvJaccard's union-sketch step relies on
    val s1 = sk(docs.filter($"tok".startsWith("a") || $"tok" < "m"))
    val s2 = sk(docs.filter(!($"tok".startsWith("a") || $"tok" < "m")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h".asc)
    val merged = s1.unionByName(s2).distinct()
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 16).drop("rk")
      .as[(String, Long)].collect().toSet
    assert(merged == bulk && bulk.nonEmpty)
  }

  test("bucketDriftTvd: clone of the corpus mix scores near 0, disjoint vocabulary near 2e6") {
    // two groups with the SAME text → identical mixes; one group with
    // completely different tokens → disjoint support
    val docs = Seq(
      ("same1", "alpha beta gamma delta epsilon zeta"),
      ("same2", "alpha beta gamma delta epsilon zeta"),
      ("weird", "zzz yyy xxx www vvv uuu")
    ).toDF("source", "text")
    val out = Curation.bucketDriftTvd(docs, "text", "source")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out("same1") == out("same2"))
    assert(out("weird") > out("same1"),
      s"disjoint group must drift more: $out")
    // the baseline INCLUDES each group's own mass: with weird at 1/3 of
    // the corpus, weird-vs-corpus = (2/3)·TVD(w, s) and
    // same-vs-corpus = (1/3)·TVD(w, s) — the disjoint group scores
    // exactly twice the clones (floor rounding aside)
    assert(math.abs(out("weird").toDouble / out("same1") - 2.0) < 0.01,
      s"self-inclusion ratio must be ~2: $out")
    // partition-invariant (pure integer divisions)
    val out2 = Curation.bucketDriftTvd(docs.repartition(7), "text", "source")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out2 == out)
  }

  test("doremiWeightLiterals: eta=0 degenerates to doc shares; excess surprisal boosts; sums ~1e6") {
    val stats = Seq(("a", 60L, 100L, 500L),   // 5.0 bits mean
      ("b", 30L, 100L, 800L),                  // 8.0 bits — the hard domain
      ("c", 10L, 100L, 500L))                  // 5.0 bits
    val flat = Curation.doremiWeightLiterals(stats, eta = 0.0).toMap
    assert(flat("a") == 600000L && flat("b") == 300000L && flat("c") == 100000L)
    val boosted = Curation.doremiWeightLiterals(stats, eta = 1.0).toMap
    assert(boosted.values.sum <= 1000000L &&
      boosted.values.sum > 1000000L - stats.size)
    // b's weight grows past its doc share; a and c shrink proportionally
    assert(boosted("b") > 300000L)
    assert(boosted("a") < 600000L && boosted("c") < 100000L)
    // a and c share mean bits, so their boosted ratio stays 6:1
    assert(math.abs(boosted("a").toDouble / boosted("c") - 6.0) < 0.01)
  }

  test("doremiWeights: relation carries exact stats and the literal weights") {
    val docs = Tables(spark, sf, "documents")
    val out = Curation.doremiWeights(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == docs.select($"source").distinct().count())
    assert(out.map(_._5).sum <= 1000000L)
    assert(out.forall(_._5 > 0))
  }

  test("temperatureQuotas: shares follow n^alpha — tail keeps a larger fraction of itself") {
    val docs = Tables(spark, sf, "documents")
    val quotas = Curation.temperatureQuotas(docs, "lang", 0.5, 100L).toMap
    val counts = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(quotas.values.sum <= 100L)
    quotas.foreach { case (g, q) => assert(q <= counts(g)) }
    // alpha < 1: every tail group's keep-fraction strictly exceeds the
    // head's (en is the largest group in the fixture)
    val headFrac = quotas("en").toDouble / counts("en")
    counts.keys.filter(_ != "en").foreach { g =>
      assert(quotas(g).toDouble / counts(g) > headFrac,
        s"$g keep-fraction not above head's $headFrac")
    }
  }

  test("temperatureMix: a larger budget extends the draw; repartition-invariant") {
    val docs = Tables(spark, sf, "documents")
    def draw(df: org.apache.spark.sql.DataFrame, b: Long) =
      Curation.temperatureMix(df, "doc_id", "lang", 0.5, b)
        .select($"doc_id").as[Long].collect().toSet
    val small = draw(docs, 60L)
    val big = draw(docs, 200L)
    assert(small.subsetOf(big) && small.nonEmpty && big.size > small.size)
    assert(draw(docs.repartition(17), 200L) == big)
  }

  test("exactQuantiles: known interpolated values, edge quantiles, singleton group") {
    // group A: 1..5 → p50 pos = 2.0 (0-based) → exactly 3;
    //          p25 pos = 1.0 → 2; p90 pos = 3.6 → 4 + 0.6·(5−4)
    // group B: {10, 20} → p50 pos = 0.5 → 15 exactly
    // group C: {7} → every quantile = 7
    val df = (Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L), ("A", 5L),
      ("B", 10L), ("B", 20L), ("C", 7L))).toDF("g", "v")
    val out = Curation.exactQuantiles(df, Seq("g"), "v",
        Seq(("p0", 0), ("p25", 2500), ("p50", 5000), ("p90", 9000),
          ("p100", 10000)))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("A", "p0")) == 1000000L)
    assert(out(("A", "p25")) == 2000000L)
    assert(out(("A", "p50")) == 3000000L)
    assert(out(("A", "p90")) == 4600000L)
    assert(out(("A", "p100")) == 5000000L)
    assert(out(("B", "p50")) == 15000000L)
    assert(out(("C", "p50")) == 7000000L && out(("C", "p100")) == 7000000L)
    // partitioning invariance
    val again = Curation.exactQuantiles(df.repartition(7), Seq("g"), "v",
        Seq(("p90", 9000)))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(again(("A", "p90")) == 4600000L)
  }

  test("rankFeatures: exact percent ranks and deciles with deterministic ties") {
    val df = Seq((1L, "t", 10L), (2L, "t", 10L), (3L, "t", 30L),
      (4L, "u", 5L)).toDF("id", "g", "v")
    val out = Curation.rankFeatures(df, Seq("g"), "v", Seq("id"))
      .select($"id", $"rn", $"n_rows", $"pct_micro", $"decile")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // tie on v=10 breaks by id: 1 before 2
    assert(out(1L) == ((1, 3L, 0L, 0L)))
    assert(out(2L) == ((2, 3L, 500000L, 3L)))
    assert(out(3L) == ((3, 3L, 1000000L, 6L)))
    // singleton group: pct 0 by convention, decile 0
    assert(out(4L) == ((1, 1L, 0L, 0L)))
  }

  test("duplicatedSpans: shared run becomes one maximal span per doc; unique text none") {
    // docs 1 and 2 share tokens 1..6 ("a b c d e f"); with n=3 the
    // duplicated gram positions are 1..4, windows [1,3]..[4,6] all
    // overlap → ONE island spanning 1..6 in each doc. doc 3 is unique.
    val d = Seq(
      (1L, "a b c d e f x1 y1 z1 w1"),
      (2L, "a b c d e f x2 y2 z2 w2"),
      (3L, "p q r s t u v w x y")
    ).toDF("doc_id", "text")
    val spans = Curation.duplicatedSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 1L, 6L, 6L, 4L), (2L, 1L, 6L, 6L, 4L)))
  }

  test("duplicatedSpans: intra-doc repetition counts toward minCount; gaps split islands") {
    // "a b c" appears twice INSIDE doc 1 (positions 1 and 7) with a
    // 3-token unique gap between the covered runs [1,3] and [7,9]:
    // pos 7 > 3 + 1 breaks the island → two separate spans.
    val d = Seq((1L, "a b c g1 g2 g3 a b c t1 t2 t3")).toDF("doc_id", "text")
    val spans = Curation.duplicatedSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 1L, 3L, 3L, 1L), (1L, 7L, 9L, 3L, 1L)))
  }

  test("duplicatedSpans: token-adjacent gram hits coalesce into one span") {
    // doc 1 shares grams with doc 2 at positions 1 and 4 only (token 7
    // differs from everything): covered runs [1,3] and [4,6] touch
    // (4 = 3 + 1) → one island 1..6 even though position 2,3 grams
    // ("b c d", "c d e") are NOT duplicated... construct: doc2 contains
    // "a b c" and "d e f" separated so its own islands also split.
    val d = Seq(
      (1L, "a b c d e f q1 q2 q3 q4"),
      (2L, "a b c z1 z2 z3 d e f z4")
    ).toDF("doc_id", "text")
    val spans = Curation.duplicatedSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 1: hits at pos 1 ("a b c") and pos 4 ("d e f") → runs [1,3]
    // ∪ [4,6] touch → single span 1..6 with 2 grams
    assert(spans.contains((1L, 1L, 6L, 6L, 2L)))
    // doc 2: hits at pos 1 and pos 7, gap → two spans
    assert(spans.contains((2L, 1L, 3L, 3L, 1L)) &&
      spans.contains((2L, 7L, 9L, 3L, 1L)))
  }

  test("trimDuplicatedSpans: owner doc keeps its copy, foreign docs are charged; untouched docs report 0") {
    val d = Seq(
      (1L, "a b c d e f x1 y1 z1 w1"),
      (2L, "a b c d e f x2 y2 z2 w2"),
      (3L, "p q r s t u v w x y")
    ).toDF("doc_id", "text")
    val out = Curation.trimDuplicatedSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // every shared gram's owner is (doc 1, its pos): doc 1 trims
    // nothing, doc 2 loses the whole shared run [1,6], doc 3 untouched
    assert(out == Set((1L, 10L, 0L, 10L), (2L, 10L, 6L, 4L),
      (3L, 10L, 0L, 10L)))
  }

  test("trimDuplicatedSpans: intra-doc repeat — the second occurrence trims, the first stays") {
    val d = Seq((1L, "a b c g1 g2 g3 a b c t1 t2 t3")).toDF("doc_id", "text")
    val out = Curation.trimDuplicatedSpans(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // owner of "a b c" is (1, 1); the pos-7 copy is foreign → 3 tokens
    assert(out == Set((1L, 12L, 3L, 9L)))
  }

  test("winnowFingerprints: the MOSS guarantee — shared run >= w+k-1 yields a common fingerprint") {
    // k=4, w=4: any shared substring of ≥ 7 tokens must contribute at
    // least one common selected fingerprint. docs share exactly 7
    // tokens embedded at different offsets in unrelated text.
    val shared = "s1 s2 s3 s4 s5 s6 s7"
    val d = Seq(
      (1L, s"u1 u2 $shared u3 u4 u5"),
      (2L, s"v1 v2 v3 v4 $shared v5")
    ).toDF("doc_id", "text")
    val fps = Curation.winnowFingerprints(d, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "a shared w+k-1 run must select a common fingerprint")
  }

  test("winnowFingerprints: short docs select nothing; selection is offset-robust") {
    val d = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // 3 grams < w
    assert(Curation.winnowFingerprints(d, "doc_id", "text", k = 4, w = 4)
      .count() == 0L)
    // shifting a doc by a prefix preserves the selected HASHES: every
    // full window of the base corresponds to a window of the shifted
    // doc with the same hashes in the same relative order, so the same
    // gram wins (positions shift, hashes don't) — the locality
    // property that makes winnowing offset-robust
    val base = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11 m12"
    val d2 = Seq((1L, base), (2L, s"pre1 pre2 pre3 $base")).toDF("doc_id", "text")
    val fps = Curation.winnowFingerprints(d2, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long, Long)].collect()
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert(h1.nonEmpty && h1.subsetOf(h2),
      s"interior fingerprints must survive an offset shift: $h1 vs $h2")
  }

  test("rendezvousShards: growing 8 → 9 moves only argmax-won keys, all onto the new shard") {
    val ids = (1L to 400L).toDF("doc_id")
    val s8 = Layout.rendezvousShards(ids, "doc_id", 8)
      .as[(Long, Int)].collect().toMap
    val s9 = Layout.rendezvousShards(ids, "doc_id", 9)
      .as[(Long, Int)].collect().toMap
    val moved = (1L to 400L).filter(id => s8(id) != s9(id))
    // every move lands on the NEW shard — the rendezvous property
    assert(moved.forall(id => s9(id) == 8), "a key moved between OLD shards")
    // expected 1/9 of keys move; allow a generous band on 400 keys
    assert(moved.size > 10 && moved.size < 110,
      s"moved ${moved.size}/400 — not ~1/9")
    // all 8 old shards populated; deterministic under repartition
    assert(s8.values.toSet == (0 until 8).toSet)
    assert(Layout.rendezvousShards(ids.repartition(7), "doc_id", 8)
      .as[(Long, Int)].collect().toMap == s8)
  }

  test("spanCorruption: splicing targets back into inputs reconstructs every document") {
    val orig = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    def sentId(t: String): Int =
      t.stripPrefix("<extra_id_").stripSuffix(">").toInt
    val out = Curation.spanCorruption(docs, "doc_id", "text",
        startPct = 30, spanLen = 3)
      .as[(Long, String, String, Long, Long)].collect()
    assert(out.length == orig.size)
    out.foreach { case (id, in, tgt, nSpans, masked) =>
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = sentId(t); spans(cur) = Vector() }
        else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = in.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(sentId(t)) else Vector(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id: splice-back diverged")
      assert(nSpans == in.split(" ").count(_.startsWith("<extra_id_")))
      val kept = in.split(" ").count(t => t.nonEmpty && !t.startsWith("<extra_id_"))
      assert(masked + kept == orig(id).split(" ").length.toLong)
    }
    // degenerate: every position a span start → one span eats the doc
    Curation.spanCorruption(docs, "doc_id", "text", startPct = 100,
        spanLen = 3)
      .as[(Long, String, String, Long, Long)].collect()
      .foreach { case (id, in, tgt, n, m) =>
        assert(in == "<extra_id_0>" && n == 1L)
        assert(tgt == "<extra_id_0> " + orig(id))
        assert(m == orig(id).split(" ").length.toLong)
      }
  }

  test("kneserNeyBigrams: hand-computed smoothed probabilities, exact mass accounting") {
    // "a b a b a c": bigrams (a b)×2, (b a)×2, (a c)×1 → 3 types;
    // prefixes: a → (c=3, cont=2), b → (2, 1); every w2 has n_pred=1 so
    // cont_micro = 1e6 div 3 = 333333 for all.
    val got = Curation.kneserNeyBigrams(Seq("a b a b a c").toDF("text"),
        "text", minCount = 1, topK = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    // P(a|b) = (8-3)/8 + (3·1·333333)/8; P(b|a) = 5/12 + (3·2·333333)/12;
    // P(c|a) = 1/12 + same second term — floors per the documented order
    assert(got == List(
      ("b a", 2L, 2L, 1L, 333333L, 749999L),
      ("a b", 2L, 3L, 2L, 333333L, 583332L),
      ("a c", 1L, 3L, 2L, 333333L, 249999L)), s"got $got")
    // discount conservation: P(b|a) + P(c|a) + the unseen (a a) backoff
    // (3·2·333333) div 12 = 166666 sums to 1e6 within floor loss ≤ 3
    assert(583332L + 249999L + 166666L > 1000000L - 4)
  }
}
