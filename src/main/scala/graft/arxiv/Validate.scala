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
    *
    * Counting convention (deliberate, and DIFFERENT from `unique_doi`
    * below): this check mirrors the reference's validation query, which
    * counts duplicated VALUES (one per group); the DDL-derived
    * [[graft.operators.Constraints.unique]] counts EXCESS ROWS (the rows a
    * database would reject). Three rows sharing one doi ⇒
    * duplicate_dois = 1, unique_doi = 2.
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

  /** V4: the COMPLETE DDL constraint surface (aupostgres.sql:1-67) as
    * violation counts — one report row per declared constraint, including
    * the dead-schema publication_venues table (never written by the
    * reference, but its DDL is declared surface — SURVEY §1.1).
    */
  def ddlConstraints(store: ArxivStore): Seq[DataFrame] = {
    def named(df: DataFrame): DataFrame =
      df.select(col("constraint_name").as("check_name"), col("violations"))
    Seq(
      // publications (aupostgres.sql:2-18)
      named(Constraints.scanReport(store.publications, Seq(
        Constraints.NotNull("submitter"),
        Constraints.Check("check_title_len", length(col("title")) > 1 && col("title") =!= ""),
        Constraints.NotNull("title")))),
      named(Constraints.unique(store.publications, Seq("doi"), "unique_doi")),
      named(Constraints.unique(store.publications, Seq("report_no"), "unique_report_no")),
      named(Constraints.unique(store.publications, Seq("title"), "unique_title")),
      // citations (aupostgres.sql:20-27) — names disambiguated from the
      // publications checks (isNotNull never yields NULL, so Check counts
      // exactly the null rows)
      named(Constraints.scanReport(store.citations, Seq(
        Constraints.Check("not_null_citation_publication_id", col("publication_id").isNotNull),
        Constraints.Check("not_null_citation_title", col("title").isNotNull)))),
      named(Constraints.foreignKey(store.citations, "publication_id",
        store.publications, "id", "fk_citations_publication")),
      // authors (aupostgres.sql:31-36)
      named(Constraints.scanReport(store.authors, Seq(
        Constraints.NotNull("name"),
        Constraints.Check("check_author_name_nonempty", col("name") =!= ""),
        Constraints.NotNull("affiliation"),
        Constraints.Check("check_author_affiliation_nonempty", col("affiliation") =!= "")))),
      // publication_venues (aupostgres.sql:39-43 — dead table, declared DDL)
      named(Constraints.scanReport(store.publicationVenues, Seq(
        Constraints.NotNull("venue_name"),
        Constraints.Check("check_venue_name_nonempty", col("venue_name") =!= ""),
        Constraints.Check("check_impact_factor_nonneg", col("impact_factor") >= 0)))),
      // categories (aupostgres.sql:46-49)
      named(Constraints.scanReport(store.categories, Seq(
        Constraints.NotNull("category_name"),
        Constraints.Check("check_category_name_nonempty", col("category_name") =!= "")))),
      // authorship (aupostgres.sql:52-58)
      named(Constraints.primaryKey(store.authorship,
        Seq("publication_id", "author_id"), "pk_authorship")),
      named(Constraints.foreignKey(store.authorship, "publication_id",
        store.publications, "id", "fk_authorship_publication")),
      named(Constraints.foreignKey(store.authorship, "author_id",
        store.authors, "id", "fk_authorship_author")),
      // publication_category (aupostgres.sql:61-67)
      named(Constraints.primaryKey(store.publicationCategory,
        Seq("publication_id", "category_id"), "pk_publication_category")),
      named(Constraints.foreignKey(store.publicationCategory, "publication_id",
        store.publications, "id", "fk_publication_category_publication")),
      named(Constraints.foreignKey(store.publicationCategory, "category_id",
        store.categories, "id", "fk_publication_category_category")))
  }

  /** Full report (the reference only logs; we return the frame). */
  def run(store: ArxivStore): DataFrame =
    Constraints.report(Seq(
      duplicateDois(store.publications),
      missingDois(store.publications),
      emptyAffiliations(store.authors)) ++ ddlConstraints(store))
}
