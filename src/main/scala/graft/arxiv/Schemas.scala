package graft.arxiv

import org.apache.spark.sql.types._

/** Schemas for the arXiv publication pipeline (SURVEY.md §1).
  *
  * Input: the arXiv metadata JSON array (dataset.json shape, SURVEY §1.3).
  * Storage: the 8-table star-ish schema of aupostgres.sql:1-77, with
  * Postgres types mapped per SURVEY §1.2 (SERIAL → LongType surrogate keys
  * we allocate; VARCHAR/TEXT → StringType; constraints live in
  * [[graft.operators.Constraints]] since Spark enforces none).
  */
object Schemas {

  /** dataset.json record shape — explicit, not inferred: half the fixture's
    * doi/report-no/license values are null (SURVEY §1.3 nullability table).
    * Hyphenated JSON names (`journal-ref`) are renamed on ingest.
    */
  val arxivInput: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("submitter", StringType),
    StructField("authors", StringType),
    StructField("title", StringType),
    StructField("comments", StringType),
    StructField("journal-ref", StringType),
    StructField("doi", StringType),
    StructField("report-no", StringType),
    StructField("categories", StringType),
    StructField("license", StringType),
    StructField("abstract", StringType),
    StructField("versions", ArrayType(StructType(Seq(
      StructField("version", StringType),
      StructField("created", StringType))))),
    StructField("update_date", StringType),
    StructField("authors_parsed", ArrayType(ArrayType(StringType)))))

  /** publications (aupostgres.sql:2-18): id SERIAL, UNIQUE doi/report_no/
    * title, CHECK char_length(title) > 1.
    */
  val publications: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("submitter", StringType),
    StructField("title", StringType),
    StructField("comments", StringType),
    StructField("journal_ref", StringType),
    StructField("doi", StringType),
    StructField("report_no", StringType),
    StructField("categories", StringType),
    StructField("license", StringType),
    StructField("abstract", StringType),
    StructField("update_date", DateType)))

  /** citations (aupostgres.sql:20-27): FK publication_id. */
  val citations: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("publication_id", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("year", IntegerType)))

  /** authors (aupostgres.sql:32-36): name + affiliation NOT NULL. */
  val authors: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("affiliation", StringType)))

  /** publication_venues (aupostgres.sql:39-43) — declared but never
    * written by any task (dead schema, preserved as surface).
    */
  val publicationVenues: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("venue_name", StringType),
    StructField("impact_factor", DoubleType)))

  /** categories (aupostgres.sql:46-49). */
  val categories: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("category_name", StringType)))

  /** authorship bridge (aupostgres.sql:52-58): composite PK. */
  val authorship: StructType = StructType(Seq(
    StructField("publication_id", LongType, nullable = false),
    StructField("author_id", LongType, nullable = false)))

  /** publication_category bridge (aupostgres.sql:61-67): composite PK. */
  val publicationCategory: StructType = StructType(Seq(
    StructField("publication_id", LongType, nullable = false),
    StructField("category_id", LongType, nullable = false)))

  /** log_table audit log (aupostgres.sql:70-77). */
  val logTable: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("operation", StringType),
    StructField("pk", LongType),
    StructField("old_values", StringType),
    StructField("new_values", StringType),
    StructField("operation_time", TimestampType)))
}
