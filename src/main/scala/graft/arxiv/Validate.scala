package graft.arxiv

import graft.operators.Constraints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validation stage (validate_data, process_publications_dag.py:486-535):
  * warn-only data-quality checks emitted as a report DataFrame
  * (check_name, violations) — V1-V3 of SURVEY §2.9, plus the declarative
  * DDL constraints (V4) the reference delegates to Postgres.
  */
object Validate {

  /** V1: duplicate non-null DOIs (GROUP BY doi HAVING COUNT(doi) > 1,
    * py:489 — the null group counts 0 and is never flagged; preserved by
    * COUNT(doi)'s null-skipping).
    */
  def duplicateDois(pubs: DataFrame): DataFrame =
    pubs.groupBy(col("doi"))
      .agg(count(col("doi")).as("c"))
      .filter(col("c") > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("duplicate_dois").as("check_name"), col("violations"))

  /** V2: missing/blank DOIs (py:497). */
  def missingDois(pubs: DataFrame): DataFrame =
    pubs.filter(col("doi").isNull || trim(col("doi")) === "")
      .agg(count(lit(1)).as("violations"))
      .select(lit("missing_dois").as("check_name"), col("violations"))

  /** V3: authors with empty affiliation (py:513). */
  def emptyAffiliations(authors: DataFrame): DataFrame =
    authors.filter(trim(col("affiliation")) === "")
      .agg(count(lit(1)).as("violations"))
      .select(lit("empty_affiliations").as("check_name"), col("violations"))

  /** V4: the DDL constraints (aupostgres.sql:1-67) as violation counts. */
  def ddlConstraints(store: ArxivStore): Seq[DataFrame] = Seq(
    Constraints.scanReport(store.publications, Seq(
      Constraints.Check("check_title_len", length(col("title")) > 1 && col("title") =!= ""),
      Constraints.NotNull("title")))
      .select(col("constraint_name").as("check_name"), col("violations")),
    Constraints.unique(store.publications, Seq("doi"), "unique_doi")
      .select(col("constraint_name").as("check_name"), col("violations")),
    Constraints.unique(store.publications, Seq("title"), "unique_title")
      .select(col("constraint_name").as("check_name"), col("violations")),
    Constraints.primaryKey(store.authorship, Seq("publication_id", "author_id"), "pk_authorship")
      .select(col("constraint_name").as("check_name"), col("violations")),
    Constraints.foreignKey(store.authorship, "publication_id",
        store.publications, "id", "fk_authorship_publication")
      .select(col("constraint_name").as("check_name"), col("violations")),
    Constraints.foreignKey(store.citations, "publication_id",
        store.publications, "id", "fk_citations_publication")
      .select(col("constraint_name").as("check_name"), col("violations")))

  /** Full report (the reference only logs; we return the frame). */
  def run(store: ArxivStore): DataFrame =
    Constraints.report(Seq(
      duplicateDois(store.publications),
      missingDois(store.publications),
      emptyAffiliations(store.authors)) ++ ddlConstraints(store))
}
