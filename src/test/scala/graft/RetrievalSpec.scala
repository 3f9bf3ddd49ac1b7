package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 correctness: the distributed inverted-index program must equal a
  * plain driver-side re-implementation of the integer-exact formula on a
  * corpus small enough to score by hand — same BIGINT products, same
  * single IEEE division, same floor-to-micro, same integer sum.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs distributed queries over columnar data"),
    (2L, "spark queries shuffle data between executors"),
    (3L, "ducks swim over the pond water"),
    (4L, "columnar data formats compress well"),
    (5L, "the pond water reflects the spark of dawn light")
  ).toDF("doc_id", "text")

  private def referenceBm25(
      docs: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
      k: Int): Set[(Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val t = toks.values.map(_.size.toLong).sum
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, os) => w -> os.size.toLong } }
    val out = for {
      (qid, terms) <- queries
      scored = toks.keys.toSeq.flatMap { d =>
        val s = terms.flatMap { term =>
          tf(d).get(term).map { f =>
            val df = tf.values.count(_.contains(term)).toLong
            val dl = toks(d).size.toLong
            val a = (2L * n - 2L * df + 1L) * 22L * f * t
            val b = (2L * df + 1L) *
              (10L * f * t + 3L * t + 9L * dl * n)
            math.floor(a.toDouble / b.toDouble * 1000000.0).toLong
          }
        }
        if (s.isEmpty) None else Some(d -> s.sum)
      }
      ((d, sc), i) <- scored.sortBy { case (d, sc) => (-sc, d) }.take(k).zipWithIndex
    } yield (qid, d, sc, i + 1)
    out.toSet
  }

  test("bm25TopK equals the driver-side integer-exact reference") {
    val queries = Seq(
      (100L, Seq("spark", "data")),
      (200L, Seq("pond", "water", "columnar")),
      (300L, Seq("the")) // df > N/2: negative idf is the documented Okapi behavior
    )
    val qdf = queries.toDF("qid", "qterms")
    val got = Retrieval.bm25TopK(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    val want = referenceBm25(
      corpus.as[(Long, String)].collect().toSeq, queries, k = 3)
    assert(got == want)
    assert(got.nonEmpty)
    // sanity on the planted structure: doc 1 and 2 both match "spark
    // data"-ish terms; a query term absent everywhere scores nothing
    val qAbsent = Seq((9L, Seq("zzz"))).toDF("qid", "qterms")
    assert(Retrieval.bm25TopK(corpus, qAbsent, "doc_id", "text",
      "qid", "qterms").count() == 0)
  }

  test("score is invariant under repartitioning (integer micro-sum is associative)") {
    val queries = Seq((1L, Seq("spark", "data", "the", "water"))).toDF("qid", "qterms")
    val base = Retrieval.bm25TopK(corpus, queries, "doc_id", "text",
        "qid", "qterms").as[(Long, Long, Long, Int)].collect().toSet
    val shuffled = Retrieval.bm25TopK(corpus.repartition(7), queries,
        "doc_id", "text", "qid", "qterms")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(base == shuffled)
  }

  /** Driver reference for [[Retrieval.bm25TopKLog]]: StrictMath idf,
    * then floor((idf_micro · 22·tf·T) / den) with the operator's exact
    * operation order.
    */
  private def referenceBm25Log(
      docs: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
      k: Int): Set[(Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val t = toks.values.map(_.size.toLong).sum
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, os) => w -> os.size.toLong } }
    def idfMicro(term: String): Long = {
      val df = tf.values.count(_.contains(term)).toLong
      Math.round(StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6)
    }
    val out = for {
      (qid, terms) <- queries
      scored = toks.keys.toSeq.flatMap { d =>
        val s = terms.flatMap { term =>
          tf(d).get(term).map { f =>
            val dl = toks(d).size.toLong
            val num = 22L * f * t
            val den = 10L * f * t + 3L * t + 9L * dl * n
            math.floor(idfMicro(term).toDouble * num.toDouble /
              den.toDouble).toLong
          }
        }
        if (s.isEmpty) None else Some(d -> s.sum)
      }
      ((d, sc), i) <- scored.sortBy { case (d, sc) => (-sc, d) }.take(k).zipWithIndex
    } yield (qid, d, sc, i + 1)
    out.toSet
  }

  test("bm25TopKLog equals the driver-side reference (real log idf)") {
    val queries = Seq(
      (100L, Seq("spark", "data")),
      (200L, Seq("pond", "water", "columnar")),
      (300L, Seq("the", "spark")) // common + rare term in one query
    )
    val qdf = queries.toDF("qid", "qterms")
    val got = Retrieval.bm25TopKLog(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    val want = referenceBm25Log(
      corpus.as[(Long, String)].collect().toSeq, queries, k = 3)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("bm25LogIdf: non-negative, strictly decreasing in df") {
    val qdf = Seq((1L, Seq("spark", "data", "the", "zzz")))
      .toDF("qid", "qterms")
    val (n, _, idf) = Retrieval.bm25LogIdf(corpus, qdf, "doc_id", "text",
      "qterms")
    assert(n == 5)
    val m = idf.toMap
    assert(!m.contains("zzz")) // absent term: no idf row, never scored
    assert(m.values.forall(_ >= 0)) // ln(1 + x), x > 0 — never negative
    // df("the") = 2 > df("spark") = 3? recount: "the" in docs 3,5; spark
    // in 1,2,5 — so df(spark)=3 > df(the)=2 ⇒ idf(spark) < idf(the)
    assert(m("spark") < m("the"))
  }

  test("bm25TopKLog is invariant under repartitioning") {
    val queries = Seq((1L, Seq("spark", "data", "the", "water"))).toDF("qid", "qterms")
    val base = Retrieval.bm25TopKLog(corpus, queries, "doc_id", "text",
        "qid", "qterms").as[(Long, Long, Long, Int)].collect().toSet
    val shuffled = Retrieval.bm25TopKLog(corpus.repartition(7), queries,
        "doc_id", "text", "qid", "qterms")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(base == shuffled)
  }

  // ------------------------------------------------------------------
  // Persisted postings lifecycle (the sixth stored-index family)
  // ------------------------------------------------------------------

  private def tmpIdx(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_postings_spec_$tag").toFile
    d.deleteOnExit()
    d.getPath
  }

  private val bigCorpus = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private val bigQueries = bigCorpus.filter(col("doc_id") % 50 === 7)
    .select(col("doc_id").as("qid"),
      array_distinct(slice(split(col("text"), " "), 1, 4)).as("qterms"))

  test("K appends equal the bulk build: stored-index serve matches in-flight bm25TopK") {
    val dir = tmpIdx("appends")
    // bulk on ~1/3, then two appends — index corpus = whole table
    Retrieval.savePostingsIndex(
      Retrieval.buildPostingsIndex(bigCorpus.filter(col("doc_id") % 3 === 0),
        "doc_id", "text"), dir)
    Retrieval.appendPostingsIndex(spark, dir,
      bigCorpus.filter(col("doc_id") % 3 === 1), "doc_id", "text")
    Retrieval.appendPostingsIndex(spark, dir,
      bigCorpus.filter(col("doc_id") % 3 === 2), "doc_id", "text")
    val served = Retrieval.bm25SearchIndex(bigQueries,
        Retrieval.loadPostingsIndex(spark, dir), "qid", "qterms", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    val inflight = Retrieval.bm25TopK(bigCorpus, bigQueries, "doc_id", "text",
        "qid", "qterms", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(served == inflight)
    assert(served.nonEmpty)
  }

  test("append writes new files only and extends the stats additively") {
    val dir = tmpIdx("mtime")
    Retrieval.savePostingsIndex(
      Retrieval.buildPostingsIndex(bigCorpus.filter(col("doc_id") % 3 === 0),
        "doc_id", "text"), dir)
    val before = parquetStamps(s"$dir/postings", s"$dir/stats")
    Thread.sleep(1100) // mtime granularity
    Retrieval.appendPostingsIndex(spark, dir,
      bigCorpus.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    val after = parquetStamps(s"$dir/postings", s"$dir/stats")
    assert(before.keySet.subsetOf(after.keySet), "append must not delete files")
    before.foreach { case (p, m) =>
      assert(after(p) == m, s"append rewrote pre-existing file $p")
    }
    assert(after.size > before.size, "append must add new files")
    // stats deltas sum to the whole corpus
    val live = Retrieval.loadPostingsIndex(spark, dir).stats
      .agg(sum(col("n")), sum(col("t"))).as[(Long, Long)].head()
    val whole = bigCorpus.select(count(lit(1)),
        sum(size(split(col("text"), " ")).cast("long")))
      .as[(Long, Long)].head()
    assert(live == whole)
  }

  test("serve runs zero postings-build jobs and prunes the scan to query-term buckets") {
    val dir = tmpIdx("serve")
    Retrieval.savePostingsIndex(
      Retrieval.buildPostingsIndex(bigCorpus, "doc_id", "text"), dir)
    val idx = Retrieval.loadPostingsIndex(spark, dir)
    val oneQ = bigQueries.limit(1).cache()
    oneQ.count() // materialize so construction-time jobs are query-side only
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val served = Retrieval.bm25SearchIndex(oneQ, idx, "qid", "qterms", k = 5)
    // construction ran exactly the bounded query-side actions (bucket
    // collect) — never a corpus tokenize (which would be a multi-job
    // shuffle of the token stream at ~1 job per action here)
    val constructionJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    assert(constructionJobs <= 2,
      s"serve construction ran $constructionJobs jobs — postings rebuild?")
    // the bucket filter reaches the postings scan as partition pruning
    // (the stats scan is unpartitioned, so match the bucket filter
    // itself rather than "some scan has no PartitionFilters")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("/postings"), s"postings scan missing:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket partition filter missing on postings scan:\n$plan")
    assert(served.count() > 0)
    oneQ.unpersist()
  }

  test("bm25Expand with no expansion terms and unit weight degenerates to bm25TopK") {
    val qdf = Seq((100L, Seq("spark", "data")),
      (200L, Seq("pond", "water", "columnar"))).toDF("qid", "qterms")
    val plain = Retrieval.bm25TopK(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    val exp = Retrieval.bm25Expand(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 3, fbDocs = 3, fbTerms = 0,
        origWeight = 1L, expWeight = 0L)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(exp == plain)
  }

  test("bm25Expand recalls a vocabulary-mismatch doc that shares no original term") {
    // doc 6 shares NO term with the query, but the feedback docs (1, 2
    // — both "spark ... data") are full of "queries"/"columnar", which
    // expansion adds; doc 6 is then reachable in round 2
    val c2 = corpus.unionByName(
      Seq((6L, "queries columnar queries columnar queries"))
        .toDF("doc_id", "text"))
    val qdf = Seq((100L, Seq("spark", "data"))).toDF("qid", "qterms")
    val plain = Retrieval.bm25TopK(c2, qdf, "doc_id", "text",
        "qid", "qterms", k = 6)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(!plain.exists(_._2 == 6L), "doc 6 must be unreachable without expansion")
    val exp = Retrieval.bm25Expand(c2, qdf, "doc_id", "text",
        "qid", "qterms", k = 6, fbDocs = 2, fbTerms = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(exp.exists(_._2 == 6L), s"expansion must recall doc 6, got $exp")
  }

  test("bm25Expand expansion terms are deterministic: weight desc, token asc ties") {
    // two runs produce identical rows (ranking ties broken on doc_id,
    // expansion ties on token — no nondeterministic surface)
    val qdf = Seq((100L, Seq("spark")), (200L, Seq("pond"))).toDF("qid", "qterms")
    def run() = Retrieval.bm25Expand(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 5, fbDocs = 2, fbTerms = 2)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(run() == run())
  }

  test("phraseMatch: consecutive-only, overlapping counts, repeated-token phrases") {
    val docs = Seq(
      (1L, "a a a b"),          // "a a" overlaps twice; "a b" once
      (2L, "a b a b a"),        // "a b a" at starts 0 and 2
      (3L, "a c b"),            // has a and b, never consecutive
      (4L, "x y z")
    ).toDF("doc_id", "text")
    val phrases = Seq(
      (10L, Seq("a", "a")),
      (20L, Seq("a", "b")),
      (30L, Seq("a", "b", "a"))
    ).toDF("pid", "pterms")
    val got = Retrieval.phraseMatch(docs, phrases, "doc_id", "text",
        "pid", "pterms")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 1L, 2L),           // overlapping "a a" in "a a a"
      (20L, 1L, 1L), (20L, 2L, 2L),
      (30L, 2L, 2L)            // overlapping repeated-token phrase
    ), s"got $got")
  }

  test("rankAgreement: identical runs score zero displacement; disjoint runs share nothing") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)).toDF("qid", "doc_id", "rn")
    val same = Retrieval.rankAgreement(a, a)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(same == Set((1L, 2L, 2L, Some(0L)), (2L, 1L, 1L, Some(0L))))
    val b = Seq((1L, 99L, 1), (2L, 20L, 3)).toDF("qid", "doc_id", "rn")
    val diff = Retrieval.rankAgreement(a, b)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(diff == Set((1L, 2L, 0L, None), (2L, 1L, 1L, Some(2L))))
  }

  test("rrfFuse: hand-checked fusion — consensus beats either single top") {
    // doc 5 is rank 2 in BOTH runs: 1e6/62 + 1e6/62 = 32258 micro
    // doc 1 tops run A only: 1e6/61 = 16393; doc 9 tops run B only
    val a = Seq((1L, 1L, 1), (1L, 5L, 2), (1L, 3L, 3)).toDF("qid", "doc_id", "rn")
    val b = Seq((1L, 9L, 1), (1L, 5L, 2)).toDF("qid", "doc_id", "rn")
    val fused = Retrieval.rrfFuse(Seq(a, b), k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(fused.map(_._2).toSeq == Seq(5L, 1L, 9L, 3L))
    assert(fused.head._3 == 1000000L / 62 * 2)
    // reproducible under run order and repartitioning
    val swapped = Retrieval.rrfFuse(Seq(b.repartition(7), a), k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(swapped.toSeq == fused.toSeq)
  }

  test("dedupResults: lower-ranked duplicate signatures suppressed, survivors re-rank densely") {
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (2L, 10L, 1)).toDF("qid", "doc_id", "rn")
    val sig = Seq((10L, "A"), (11L, "A"), (12L, "B"), (13L, "A"))
      .toDF("doc_id", "sig")
    val got = Retrieval.dedupResults(run, sig)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 10L, 1, 1),   // best A survives
      (1L, 12L, 3, 2),   // B re-ranks densely behind it
      (2L, 10L, 1, 1)))  // suppression is per-query, not global
  }

  test("hardNegatives: keeps below-threshold pairs only, drops self, exact micro cosine") {
    val run = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3)).toDF("qid", "doc_id", "rn")
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),   // the query
      (2L, Seq(1.0f, 0.0f)),   // cosine 1.0 — not a negative
      (3L, Seq(0.0f, 1.0f))    // cosine 0.0 — hard negative
    ).toDF("id", "embedding")
    val got = Retrieval.hardNegatives(run, vecs, "id", "embedding",
        simThresholdMicro = 500000L)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 3L, 3, 0L)), s"got $got")
  }

  test("mmrRerank: redundant runner-up demoted below a diverse lower-ranked doc") {
    // docs 1 and 2 are identical vectors (sim 1.0); doc 3 is orthogonal.
    // Pure relevance order is 1, 2, 3 — MMR at λ=0.7 must pick 1, then
    // prefer 3 (rel 800k, sim 0) over 2 (rel 900k, sim 1e6):
    // 7·9e5 − 3·1e6 = 3.3e6  <  7·8e5 − 0 = 5.6e6
    val run = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3)).toDF("qid", "doc_id", "rn")
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("doc_id", "embedding")
    val got = Retrieval.mmrRerank(run, vecs, "doc_id", "embedding",
        k = 3, lambdaTenths = 7)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), s"got ${got.toSeq}")
    assert(got(0)._4 == 7000000L)           // 7·1e6, nothing selected yet
    assert(got(1)._4 == 7L * 800000L)       // doc 3: sim to doc 1 is 0
    assert(got(2)._4 == 7L * 900000L - 3L * 1000000L) // doc 2 vs its twin
    // λ = 10 degenerates to pure relevance order
    val pure = Retrieval.mmrRerank(run, vecs, "doc_id", "embedding",
        k = 3, lambdaTenths = 10)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    assert(pure.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("kwicSnippets: earliest term wins, window clamps at both edges") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x x x x x x x x target")
    ).toDF("doc_id", "text")
    val queries = Seq((100L, Seq("e", "c")), (200L, Seq("target")))
      .toDF("qid", "qterms")
    val run = Seq((100L, 1L, 1), (200L, 2L, 1)).toDF("qid", "doc_id", "rn")
    val got = Retrieval.kwicSnippets(run, docs, queries,
        "doc_id", "text", "qid", "qterms", window = 3)
      .as[(Long, Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      // earliest of {e@5, c@3} is c at pos 3: window [1, 6] clamps left
      (100L, 1L, 1, 3, "a b c d e f"),
      // target at pos 9: window [6, 12] clamps right
      (200L, 2L, 1, 9, "x x x target")), s"got $got")
  }

  test("positional index: appends equal the bulk build; serve matches in-flight; bucket-pruned scan") {
    val phrases = Seq((100L, Seq("spark", "queries")),
      (200L, Seq("pond", "water"))).toDF("pid", "pterms")
    val want = Retrieval.phraseMatch(corpus, phrases, "doc_id", "text",
        "pid", "pterms")
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_posidx").toString
    Retrieval.savePositionalIndex(
      Retrieval.buildPositionalIndex(corpus.filter(col("doc_id") <= 3),
        "doc_id", "text", nBuckets = 4), dir)
    // append must not rewrite committed files
    val before = new java.io.File(s"$dir/postings").listFiles().toSeq
      .filter(_.isDirectory).flatMap(_.listFiles())
      .map(f => f.getPath -> f.lastModified()).toMap
    Retrieval.appendPositionalIndex(spark, dir,
      corpus.filter(col("doc_id") > 3), "doc_id", "text")
    val after = new java.io.File(s"$dir/postings").listFiles().toSeq
      .filter(_.isDirectory).flatMap(_.listFiles())
      .map(f => f.getPath -> f.lastModified()).toMap
    before.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"append rewrote committed file $p") }
    val idx = Retrieval.loadPositionalIndex(spark, dir)
    val served = Retrieval.phraseSearchIndex(phrases, idx, "pid", "pterms")
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket partition filter missing on positional scan:\n$plan")
    assert(served.as[(Long, Long, Long)].collect().toSet == want)
  }

  test("ndcgMrrEval: hand-computed nDCG/MRR, perfect ranking, no-relevant query") {
    // discount literals at k=3: 1000000, 630929 (floor 1e6/log2 3), 500000
    assert(Retrieval.dcgDiscountMicros(3) ==
      Seq((1, 1000000L), (2, 630929L), (3, 500000L)))
    val run = Seq( // (qid, doc_id, rn)
      (1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), // A: relevant at 2, 3
      (2L, 21L, 1), (2L, 22L, 2),               // B: nothing relevant
      (3L, 31L, 1), (3L, 32L, 2)                // C: perfect ordering
    ).toDF("qid", "doc_id", "rn")
    val qrels = Seq( // (qid, doc_id, rel) — 19 is judged but unretrieved
      (1L, 12L, 2L), (1L, 13L, 1L), (1L, 19L, 3L),
      (2L, 21L, 0L),
      (3L, 31L, 2L), (3L, 32L, 1L)
    ).toDF("qid", "doc_id", "rel")
    val got = Retrieval.ndcgMrrEval(run, qrels, k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // A: dcg = 2·630929 + 1·500000; ideal = 19(3), 12(2), 13(1)
    val dcgA = 2L * 630929 + 500000
    val idcgA = 3L * 1000000 + 2L * 630929 + 500000
    assert(got(1L) == ((1L, 3L, dcgA, idcgA, 500000L,
      dcgA * 1000000L / idcgA)))
    // B: judged rel-0 only — everything zero
    assert(got(2L) == ((2L, 0L, 0L, 0L, 0L, 0L)))
    // C: run order IS the ideal order — ndcg exactly 1e6, mrr 1e6
    val dcgC = 2L * 1000000 + 630929
    assert(got(3L) == ((3L, 2L, dcgC, dcgC, 1000000L, 1000000L)))
  }

  test("ndcgMrrEvalFull: a judged query the run skipped scores 0, not absent") {
    val run = Seq( // qid 1 judged but NOT run — the TREC missing-query case
      (2L, 21L, 1), (2L, 22L, 2),
      (3L, 31L, 1), (3L, 32L, 2)
    ).toDF("qid", "doc_id", "rn")
    val qrels = Seq(
      (1L, 12L, 2L), (1L, 13L, 1L), (1L, 19L, 3L),
      (2L, 21L, 0L),
      (3L, 31L, 2L), (3L, 32L, 1L)
    ).toDF("qid", "doc_id", "rel")
    // the run-seeded variant silently drops qid 1 — the documented caveat
    assert(!Retrieval.ndcgMrrEval(run, qrels, k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().exists(_._1 == 1L))
    val got = Retrieval.ndcgMrrEvalFull(run, qrels, k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    // qid 1: real n_rel/idcg (ideal = 19(3), 12(2), 13(1)), zeros elsewhere
    val idcg1 = 3L * 1000000 + 2L * 630929 + 500000
    assert(got(1L) == ((1L, 3L, 0L, idcg1, 0L, 0L)))
    // run qids keep their exact run-seeded rows
    assert(got(2L) == ((2L, 0L, 0L, 0L, 0L, 0L)))
    val dcgC = 2L * 1000000 + 630929
    assert(got(3L) == ((3L, 2L, dcgC, dcgC, 1000000L, 1000000L)))
  }
}
