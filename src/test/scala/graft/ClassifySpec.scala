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
}
