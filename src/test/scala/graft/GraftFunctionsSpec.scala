package graft

import graft.arxiv.{Citations, Transforms}
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctionRegistry

/** SQL ↔ DataFrame parity for the registered function surface: every
  * graft function called through `spark.sql` on a FRESH session must equal
  * its Column form — and plan as the same expression (no UDF black box).
  */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val s2 = {
    val s = spark.newSession()
    GraftFunctionRegistry.register(s)
    Tables(s, sf, "documents").limit(50).createOrReplaceTempView("docs")
    s
  }

  private def parity(sqlExpr: String, colExpr: org.apache.spark.sql.Column): Unit = {
    val viaSql = s2.sql(s"SELECT doc_id, $sqlExpr AS v FROM docs ORDER BY doc_id")
      .collect().map(_.toString).toSeq
    val viaDf = s2.table("docs")
      .select(col("doc_id"), colExpr.as("v")).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(viaSql == viaDf, s"SQL/DataFrame mismatch for $sqlExpr")
  }

  test("text functions: SQL equals DataFrame") {
    parity("fingerprint(text)", TextAnalysis.fingerprint(col("text")))
    parity("prefix_fingerprint(text, 8)", TextAnalysis.prefixFingerprint(col("text"), 8))
    parity("lang_id(text)", TextAnalysis.langId(col("text")))
    parity("token_count(text)", TextAnalysis.tokenCount(col("text")))
    parity("bpe_token_estimate(text)", TextAnalysis.bpeTokenEstimate(col("text")))
    parity("word_ngrams(text, 3)", TextAnalysis.wordNGrams(col("text"), 3))
    parity("char_ngrams(text, 4)", TextAnalysis.charNGrams(col("text"), 4))
    parity("quality_metrics(text)", TextAnalysis.qualityMetrics(col("text")))
    parity("quality_score(text)", TextAnalysis.qualityScore(col("text")))
    parity("scrub_pii(text)", TextAnalysis.scrubPii(col("text")))
    parity("pii_count(text)",
      TextAnalysis.piiCounts(col("text")).values.reduce(_ + _))
  }

  test("arxiv scalar functions: SQL equals DataFrame") {
    parity("extract_publication_type(text)",
      Transforms.extractPublicationType(col("text")))
    parity("extract_citation_author(text)", Citations.extractAuthor(col("text")))
    val viaSql = s2.sql(
      "SELECT normalize_category('cs.AI'), map_to_normalized_category('nope')")
      .head()
    val expected = Transforms.categoryMapping.toMap.apply("cs.AI")
    assert(viaSql.getString(0) == expected)
    assert(viaSql.getString(1) == "Other")
  }

  test("vector functions resolve and compute exactly") {
    val r = s2.sql(
      "SELECT dot_long(array(2L,3L), array(4L,5L)), dot_double(array(0.5D,2.0D), array(2.0D,0.25D))")
      .head()
    assert(r.getLong(0) == 23L && r.getDouble(1) == 1.5)
  }

  test("non-integer n-gram size argument fails with a clear message") {
    val e = intercept[Exception] {
      s2.sql("SELECT word_ngrams(text, 'three') FROM docs").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("literal integer")))
  }

  test("SQL form stays an expression: no ScalaUDF node in the plan") {
    val plan = s2.sql("SELECT fingerprint(text), quality_score(text) FROM docs")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"expected pure expressions, got:\n$plan")
  }
}
