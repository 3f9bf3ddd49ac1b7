package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq("x").toDF("dummy").select(c).head()

  test("tokenCount and ngram guard") {
    val df = Seq("a b c d", "a").toDF("t")
    assert(df.select(TextAnalysis.tokenCount($"t")).as[Int].collect().toSeq == Seq(4, 1))
    val grams = df.select(TextAnalysis.wordNGrams($"t", 3)).as[Seq[String]].collect()
    assert(grams(0) == Seq("a b c", "b c d"))
    assert(grams(1).isEmpty) // shorter than n → empty, not a descending sequence
    assert(df.select(TextAnalysis.charNGrams($"t", 2)).as[Seq[String]].head() ==
      Seq("a ", " b", "b ", " c", "c ", " d"))
  }

  test("occurrences counts non-overlapping matches") {
    val df = Seq(" the cat the dog the ", " the the the ").toDF("t")
    val counts = df.select(TextAnalysis.occurrences($"t", " the ")).as[Long].collect().toSeq
    // adjacent "the the the": the middle one's leading space is consumed
    // by the first match, so only 2 of 3 count (replace-trick semantics)
    assert(counts == Seq(3L, 2L))
  }

  test("langId picks max-marker language, und fallback, first-wins ties") {
    val df = Seq(
      "the cat and the dog is here", // en
      "der hund und die katze ist", // de
      "xyz qqq zzz" // no markers
    ).toDF("t")
    assert(df.select(TextAnalysis.langId($"t")).as[String].collect().toSeq ==
      Seq("en", "de", "und"))
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq(("A  b\tC", "a b c")).toDF("x", "y")
    val r = df.select(
      TextAnalysis.fingerprint($"x") === TextAnalysis.fingerprint($"y")).as[Boolean].head()
    assert(r)
  }

  test("quality metrics are exact ratios") {
    val m = Seq("ab cd ab").toDF("t")
      .select(TextAnalysis.qualityMetrics($"t").as("m"))
      .select($"m.n_tokens", $"m.uniq_token_ratio", $"m.avg_token_len")
      .as[(Long, Double, Double)].head()
    assert(m == ((3L, 2.0 / 3, 8.0 / 3)))
  }

  test("bpe estimate: at least one token per word, more for long words") {
    val df = Seq("hi supercalifragilistic").toDF("t")
    // "hi" → 1, "supercalifragilistic" (20 chars) → ceil(20/4) = 5
    assert(df.select(TextAnalysis.bpeTokenEstimate($"t")).as[Long].head() == 6L)
  }

  test("piiCounts finds emails/phones/IPs; scrubPii redacts them all") {
    val df = Seq(
      "mail a.b-c@ex-1.org or x@y.io, call 555-123-4567, host 10.0.0.1 up",
      "no pii here at all").toDF("t")
    val c = TextAnalysis.piiCounts($"t")
    val rows = df.select(c("email").as("e"), c("phone").as("p"),
        c("ipv4").as("i"), TextAnalysis.scrubPii($"t").as("r"))
      .as[(Int, Int, Int, String)].collect()
    assert((rows(0)._1, rows(0)._2, rows(0)._3) == ((2, 1, 1)))
    assert(rows(0)._4 ==
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> up")
    assert((rows(1)._1, rows(1)._2, rows(1)._3) == ((0, 0, 0)))
    assert(rows(1)._4 == "no pii here at all")
    // a phone-like run glued to a word boundary test: \b guards both ends
    val edge = Seq("x555-123-45678 and 555-123-4567x").toDF("t")
      .select(c("phone")).as[Int].head()
    assert(edge == 0, "\\b must reject digit runs embedded in longer tokens")
  }

  test("scrubPii is a fixpoint: zero PII counts after redaction, corpus-wide") {
    // the q104 planting over the real corpus — every doc that had PII
    // must count zero afterwards (guards against a replacement token
    // ever re-triggering a pattern)
    val planted = Tables(spark, sf, "documents").withColumn("t",
      concat($"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact u"), $"doc_id".cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 11 === 0, lit(" call 555-010-0199 now")).otherwise(lit("")),
        when($"doc_id" % 13 === 0, lit(" from 10.0.42.7 today")).otherwise(lit(""))))
    val before = planted.select(
      TextAnalysis.piiCounts($"t").values.reduce(_ + _).as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(before > 0, "the planting must create PII to scrub")
    val after = planted.select(TextAnalysis.scrubPii($"t").as("r"))
      .select(TextAnalysis.piiCounts($"r").values.reduce(_ + _).as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(after == 0L)
  }
}
