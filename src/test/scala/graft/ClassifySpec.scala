package graft

import graft.operators.Classify

/** Hashed Naive Bayes: separable-vocabulary recovery, argmax tie-break,
  * model-size bounds, determinism.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "alpha alpha beta", "A"),
    (2L, "alpha beta beta alpha", "A"),
    (3L, "alpha alpha alpha", "A"),
    (4L, "gamma delta gamma", "B"),
    (5L, "delta delta gamma", "B"),
    (6L, "gamma gamma delta delta", "B")
  ).toDF("doc_id", "text", "label")

  test("classifies held-out docs from a separable vocabulary") {
    val model = Classify.fitHashedNb(train, "text", "label", nBuckets = 32)
    val test = Seq((10L, "alpha beta alpha"), (11L, "delta gamma gamma"))
      .toDF("doc_id", "text")
    val byId = Classify.scoreHashedNb(test, "doc_id", "text", model)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(byId == Map(10L -> "A", 11L -> "B"))
  }

  test("model is bounded: classes × buckets likelihoods, one prior per class") {
    val model = Classify.fitHashedNb(train, "text", "label", nBuckets = 32)
    assert(model.labels == Seq("A", "B"))
    assert(model.likeMicro.size == 2 * 32)
    assert(model.priorMicro.keySet == Set("A", "B"))
    // balanced classes: equal priors
    assert(model.priorMicro("A") == model.priorMicro("B"))
  }

  test("exact score tie breaks on label ascending") {
    // identical training text for both classes ⇒ identical likelihoods
    // and priors ⇒ every test doc ties ⇒ the smaller label wins
    val tied = Seq((1L, "x y z", "B"), (2L, "x y z", "A"))
      .toDF("doc_id", "text", "label")
    val model = Classify.fitHashedNb(tied, "text", "label", nBuckets = 8)
    val out = Classify.scoreHashedNb(
        Seq((9L, "x y")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, String, Long)].collect()
    assert(out.head._2 == "A")
  }

  test("fit and scores are deterministic across partitionings") {
    val m1 = Classify.fitHashedNb(train, "text", "label", nBuckets = 16)
    val m2 = Classify.fitHashedNb(train.repartition(7), "text", "label",
      nBuckets = 16)
    assert(m1 == m2)
    val docs = Tables(spark, sf, "documents").limit(40)
    val model = Classify.fitHashedNb(
      Tables(spark, sf, "documents"), "text", "lang", nBuckets = 64)
    val s1 = Classify.scoreHashedNb(docs, "doc_id", "text", model)
      .as[(Long, String, Long)].collect().toSet
    val s2 = Classify.scoreHashedNb(docs.repartition(5), "doc_id", "text",
        model)
      .as[(Long, String, Long)].collect().toSet
    assert(s1 == s2 && s1.size == 40)
  }

  test("rocAuc: perfect, reversed, tied, mixed, and degenerate groups") {
    val rows = Seq(
      // perfect: every positive outranks every negative → 1e6
      ("p", 10L, 1), ("p", 9L, 1), ("p", 2L, 0), ("p", 1L, 0),
      // reversed: every negative on top → 0
      ("r", 10L, 0), ("r", 9L, 0), ("r", 2L, 1), ("r", 1L, 1),
      // all tied on one score → exactly 1/2
      ("t", 5L, 1), ("t", 5L, 0),
      // mixed with a tie: pos {4, 2}, neg {3, 2}: pairs (4,3)=1,
      // (4,2)=1, (2,3)=0, (2,2)=½ → U = 2.5 of 4 → 625000
      ("m", 4L, 1), ("m", 2L, 1), ("m", 3L, 0), ("m", 2L, 0),
      // degenerate: no negatives → AUC undefined (NULL)
      ("d", 7L, 1), ("d", 3L, 1)
    ).toDF("g", "score", "label")
    val got = Classify.rocAuc(rows, Seq("g"), "score", "label")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("p") == ((2L, 2L, Some(1000000L))))
    assert(got("r") == ((2L, 2L, Some(0L))))
    assert(got("t") == ((1L, 1L, Some(500000L))))
    assert(got("m") == ((2L, 2L, Some(625000L))))
    assert(got("d") == ((2L, 0L, None)))
  }

  test("prCurve: hand-computed sweep; no-positive group has NULL recall/f1") {
    val rows = Seq(
      ("g", 3L, 1), ("g", 2L, 0), ("g", 1L, 1),
      ("z", 5L, 0), ("z", 4L, 0)
    ).toDF("g", "score", "label")
    val got = Classify.prCurve(rows, Seq("g"), "score", "label")
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // cut at 3: P = 1/1, R = 1/2, F1 = floor(2·1e6·5e5 / 1.5e6)
    assert(got(("g", 3L)) ==
      (("g", 3L, 1L, 1L, 2L, 1000000L, Some(500000L), Some(666666L))))
    // cut at 2: the false positive enters → P = R = 1/2
    assert(got(("g", 2L)) ==
      (("g", 2L, 1L, 2L, 2L, 500000L, Some(500000L), Some(500000L))))
    // cut at 1: everything predicted positive → R = 1, P = 2/3
    assert(got(("g", 1L)) ==
      (("g", 1L, 2L, 3L, 2L, 666666L, Some(1000000L), Some(799999L))))
    assert(got(("z", 5L)) ==
      (("z", 5L, 0L, 1L, 0L, 0L, None, None)))
  }

  test("calibrationBins: hand-computed bins; 1e6 caps into the top bin; " +
      "a perfectly calibrated score has zero gap everywhere") {
    val rows = Seq(
      ("g", 50000L, 0L),   // bin 0: conf 50000, acc 0
      ("g", 150000L, 1L),  // bin 1: conf 150000, acc 1e6
      ("g", 999999L, 1L),  // bin 9
      ("g", 1000000L, 1L)  // exactly 1e6 must cap into bin 9, not 10
    ).toDF("g", "score", "label")
    val got = Classify.calibrationBins(rows, Seq("g"), "score", "label")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    assert(got(0L) == (("g", 0L, 1L, 50000L, 0L, 50000L)))
    assert(got(1L) == (("g", 1L, 1L, 150000L, 1000000L, 850000L)))
    // bin 9: n=2, conf = (999999+1000000) div 2, acc = 1e6, gap = 1
    assert(got(9L) == (("g", 9L, 2L, 999999L, 1000000L, 1L)))
    assert(got.size == 3)
    // score == label·1e6 ⇒ claimed confidence is the observed rate
    val perfect = Seq.tabulate(40)(i =>
      ("p", if (i % 3 == 0) 1000000L else 0L, if (i % 3 == 0) 1L else 0L))
      .toDF("g", "score", "label")
    val gaps = Classify.calibrationBins(perfect, Seq("g"), "score", "label")
      .select($"gap_micro").as[Long].collect()
    assert(gaps.nonEmpty && gaps.forall(_ == 0L))
  }

  test("distillQualityFeatures: exact teacher ratio, bucket counts " +
      "partition the token count, independent hash family") {
    val docs = Seq((1L, "a b a"), (2L, "x"), (3L, "w w w w"))
      .toDF("doc_id", "text")
    val f = Classify.distillQualityFeatures(docs, "doc_id", "text",
      nBuckets = 8)
    val rows = f.collect().map(r =>
      r.getLong(0) -> r).toMap
    // teacher = floor(1e6 · uniq / total), exact integers
    assert(rows(1L).getAs[Long]("n_tokens") == 3L &&
      rows(1L).getAs[Long]("y_micro") == 666666L)
    assert(rows(2L).getAs[Long]("n_tokens") == 1L &&
      rows(2L).getAs[Long]("y_micro") == 1000000L)
    assert(rows(3L).getAs[Long]("n_tokens") == 4L &&
      rows(3L).getAs[Long]("y_micro") == 250000L)
    // the hashed buckets PARTITION the tokens: Σ f_j = n_tokens
    val fc = (0 until 8).map(j => s"f$j")
    rows.values.foreach { r =>
      assert(fc.map(c => r.getAs[Long](c)).sum ==
        r.getAs[Long]("n_tokens"))
    }
    // the quality features draw from their own `qf:` hash family —
    // a token need not land where the NB `nb:` family puts it, and
    // the mapping is the documented md5 idiom
    val wBucket = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("qf:w")
        .substring(0, 15), 16) % 8
    assert(rows(3L).getAs[Long](s"f$wBucket") == 4L)
    intercept[IllegalArgumentException] {
      Classify.distillQualityFeatures(docs, "doc_id", "text", nBuckets = 1)
    }
  }
}
