package graft.arxiv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three analytical report queries (aupostgres.sql:
  * 102-129; the file's other two queries are verbatim duplicates of the
  * first two). Each exists twice: DataFrame API and `spark.sql` over the
  * registered temp views — both build the same logical plan (SURVEY §3 E2).
  */
object Analytics {

  /** Q1 (aupostgres.sql:102-106): publications per author — inner join
    * small dim (broadcast) + hash agg + sort (J1, A5, O1).
    */
  def authorPublicationCounts(store: ArxivStore): DataFrame =
    store.authors.join(store.authorship,
        store.authors("id") === store.authorship("author_id"))
      .groupBy(store.authors("id"), col("name"))
      .agg(count(col("publication_id")).as("publication_count"))
      .orderBy(col("publication_count").desc, col("id").asc)

  def authorPublicationCountsSql(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT a.id, a.name, COUNT(ap.publication_id) AS publication_count
      FROM authors a
      JOIN authorship ap ON a.id = ap.author_id
      GROUP BY a.id, a.name
      ORDER BY publication_count DESC, a.id""")

  /** Q2 (aupostgres.sql:108-119): citation counts — LEFT join so uncited
    * papers keep a 0 via null-skipping COUNT(c.id) (J2, A6, O2's
    * deterministic tiebreak).
    */
  def citationCounts(store: ArxivStore): DataFrame =
    store.publications.as("p")
      .join(store.citations.as("c"),
        col("p.id") === col("c.publication_id"), "left_outer")
      .groupBy(col("p.id").as("publication_id"), col("p.title").as("publication_title"))
      .agg(count(col("c.id")).as("citation_count"))
      .orderBy(col("citation_count").desc, col("publication_title").asc)

  def citationCountsSql(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT p.id AS publication_id, p.title AS publication_title,
             COUNT(c.id) AS citation_count
      FROM publications p
      LEFT JOIN citations c ON p.id = c.publication_id
      GROUP BY p.id, p.title
      ORDER BY citation_count DESC, p.title""")

  /** Q3 (aupostgres.sql:124-129): publications per category — 3-way inner
    * join (J3, A7).
    */
  def categoryPublicationCounts(store: ArxivStore): DataFrame =
    store.categories.as("cat")
      .join(store.publicationCategory.as("pc"), col("cat.id") === col("pc.category_id"))
      .join(store.publications.as("p"), col("pc.publication_id") === col("p.id"))
      .groupBy(col("category_name"))
      .agg(count(col("p.id")).as("publication_count"))
      .orderBy(col("publication_count").desc, col("category_name").asc)

  def categoryPublicationCountsSql(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT cat.category_name, COUNT(p.id) AS publication_count
      FROM categories cat
      JOIN publication_category pc ON cat.id = pc.category_id
      JOIN publications p ON pc.publication_id = p.id
      GROUP BY cat.category_name
      ORDER BY publication_count DESC, cat.category_name""")
}
