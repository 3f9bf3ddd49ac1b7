package graft.arxiv

import org.apache.spark.sql.SparkSession

/** SQL-callable registrations of the pipeline's scalar helpers (SURVEY §7
  * optional surface): after `registerAll`, `spark.sql` users get the same
  * F8/F9/F4 semantics as the DataFrame API.
  *
  * These are scalar Scala UDFs (not codegen'd) — fine for the SQL-parity
  * surface; hot paths should keep using the Column forms
  * ([[Transforms.extractPublicationType]] etc.), which stay inside
  * whole-stage codegen.
  */
object ArxivFunctions {

  private val typeBranches: Seq[(String, String)] = Seq(
    "@article" -> "Journal Article",
    "@inproceedings" -> "Conference Paper",
    "@book" -> "Book",
    "@thesis" -> "Thesis",
    "@techreport" -> "Technical Report",
    "@manual" -> "Manual",
    "@proceedings" -> "Conference Proceedings",
    "@unpublished" -> "Unpublished Work",
    "@misc" -> "Miscellaneous",
    "@phdthesis" -> "PhD Thesis",
    "@mastersthesis" -> "Masters Thesis",
    "@inbook" -> "Book Chapter",
    "@incollection" -> "Collection",
    "@patent" -> "Patent",
    "@online" -> "Online Resource")

  /** F8 scalar twin of [[Transforms.extractPublicationType]]. */
  def extractPublicationType(bib: String): String =
    if (bib == null) "Unknown"
    else typeBranches.collectFirst {
      case (marker, label) if bib.contains(marker) => label
    }.getOrElse("Unknown")

  // built once — as a per-row UDF the lookup must not rebuild the map
  private val categoryLookup: Map[String, String] = Transforms.categoryMapping.toMap

  /** F9 scalar twin of [[Transforms.normalizeFieldsOfStudy]]. */
  def normalizeCategory(category: String): String =
    categoryLookup.getOrElse(category, "Other")

  /** F4 scalar twin of [[Citations.extractAuthor]]. */
  def extractCitationAuthor(summary: String): String =
    if (summary == null || !summary.contains("-")) "Unknown"
    else summary.split("-")(0).trim

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("extract_publication_type", extractPublicationType _)
    spark.udf.register("normalize_category", normalizeCategory _)
    spark.udf.register("extract_citation_author", extractCitationAuthor _)
  }
}
