// Hosted under org.apache.spark.sql.* for the private[sql] Column ↔
// Expression bridge (ExpressionUtils) — same pattern as VectorExpressions.
package org.apache.spark.sql.graft

import graft.arxiv.{Citations, Transforms}
import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._

/** SQL registration for the WHOLE graft function surface — `spark.sql`
  * parity with the DataFrame API (SURVEY §2.12 follow-up).
  *
  * Every function is registered as an EXPRESSION BUILDER, not a UDF: the
  * builder wraps the argument expressions in Columns, applies the same
  * Column composition the DataFrame API uses, and unwraps the resulting
  * Catalyst tree — so the SQL form plans, folds, pushes down, and
  * whole-stage-codegens exactly like the DataFrame form (a scalar UDF
  * would be an interpreter black box on the hot path).
  *
  * Two entry points: [[register]] for an existing session, or
  * `spark.sql.extensions=graft.GraftExtensions` for config-injected
  * availability in every session.
  */
object GraftFunctionRegistry {

  private def c(e: Expression): Column = ExpressionUtils.column(e)

  /** Column → catalyst Expression, CONVERTED (not lazily wrapped):
    * registry builders must return a real expression tree — the analyzer
    * resolves any UnresolvedFunction nodes it contains in later passes,
    * whereas the lazy ColumnNodeExpression wrapper would survive into
    * execution as an Unevaluable.
    */
  private def e(col: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(col.node)

  /** Constant int argument (e.g. an n-gram size) — must be a literal. */
  private def intArg(x: Expression, fn: String): Int = {
    val v = x match {
      case Literal(i: Int, _) => i
      case other if other.foldable => other.eval() // may be null / non-numeric
      case _ => null
    }
    v match {
      case n: Number => n.intValue
      case _ => throw new IllegalArgumentException(
        s"$fn expects a literal integer argument, got ${x.sql}")
    }
  }

  /** Column twin of the reference's category normalization (F9) as a pure
    * expression: map-literal lookup with 'Other' default.
    */
  private def normalizeCategoryCol(cat: Column): Column =
    coalesce(element_at(typedLit(Transforms.categoryMapping.toMap), cat),
      lit("Other"))

  /** name → (className for EXPLAIN/DESCRIBE, expression builder). */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_long", classOf[LongDot].getName,
      (xs: Seq[Expression]) => LongDot(xs.head, xs(1))),
    ("dot_double", classOf[DoubleDot].getName,
      (xs: Seq[Expression]) => DoubleDot(xs.head, xs(1))),
    ("fingerprint", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.fingerprint(c(xs.head)))),
    ("prefix_fingerprint", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) =>
        e(TextAnalysis.prefixFingerprint(c(xs.head), intArg(xs(1), "prefix_fingerprint")))),
    ("lang_id", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.langId(c(xs.head)))),
    ("token_count", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.tokenCount(c(xs.head)))),
    ("bpe_token_estimate", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.bpeTokenEstimate(c(xs.head)))),
    ("word_ngrams", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) =>
        e(TextAnalysis.wordNGrams(c(xs.head), intArg(xs(1), "word_ngrams")))),
    ("char_ngrams", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) =>
        e(TextAnalysis.charNGrams(c(xs.head), intArg(xs(1), "char_ngrams")))),
    ("quality_metrics", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.qualityMetrics(c(xs.head)))),
    ("quality_score", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.qualityScore(c(xs.head)))),
    ("extract_publication_type", "graft.arxiv.Transforms",
      (xs: Seq[Expression]) => e(Transforms.extractPublicationType(c(xs.head)))),
    ("normalize_category", "graft.arxiv.Transforms",
      (xs: Seq[Expression]) => e(normalizeCategoryCol(c(xs.head)))),
    // reference DAG name for the same operation (map_to_normalized_category)
    ("map_to_normalized_category", "graft.arxiv.Transforms",
      (xs: Seq[Expression]) => e(normalizeCategoryCol(c(xs.head)))),
    ("extract_citation_author", "graft.arxiv.Citations",
      (xs: Seq[Expression]) => e(Citations.extractAuthor(c(xs.head)))),
    ("scrub_pii", "graft.functions.TextAnalysis",
      (xs: Seq[Expression]) => e(TextAnalysis.scrubPii(c(xs.head)))),
    ("pii_count", "graft.functions.TextAnalysis",
      // total PII matches of all kinds in one scan
      (xs: Seq[Expression]) =>
        e(TextAnalysis.piiCounts(c(xs.head)).values.reduce(_ + _))))

  /** Session-local registration of every graft function. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Extension injection (spark.sql.extensions path). */
  def injectAll(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, className, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
}
