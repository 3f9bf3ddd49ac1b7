package graft.arxiv

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The three commented-out transform tasks (process_publications_dag.py:
  * 573-589) — reachable capability, disabled by default in [[Pipeline]]
  * for parity with the commented-out wiring (SURVEY §2.13 D2).
  */
object Transforms {

  /** F8: the 15-branch contains→case chain over bib_entry (py:271-304).
    * Branch ORDER is semantic and preserved verbatim. (Note: '@thesis'
    * before '@phdthesis' is safe — '@phdthesis' does not contain the
    * substring '@thesis', so every branch is reachable; a bib entry
    * containing both markers resolves by chain order, as in the
    * reference.)
    */
  def extractPublicationType(bib: Column): Column =
    when(bib.contains("@article"), "Journal Article")
      .when(bib.contains("@inproceedings"), "Conference Paper")
      .when(bib.contains("@book"), "Book")
      .when(bib.contains("@thesis"), "Thesis")
      .when(bib.contains("@techreport"), "Technical Report")
      .when(bib.contains("@manual"), "Manual")
      .when(bib.contains("@proceedings"), "Conference Proceedings")
      .when(bib.contains("@unpublished"), "Unpublished Work")
      .when(bib.contains("@misc"), "Miscellaneous")
      .when(bib.contains("@phdthesis"), "PhD Thesis")
      .when(bib.contains("@mastersthesis"), "Masters Thesis")
      .when(bib.contains("@inbook"), "Book Chapter")
      .when(bib.contains("@incollection"), "Collection")
      .when(bib.contains("@patent"), "Patent")
      .when(bib.contains("@online"), "Online Resource")

  /** resolve_publication_types (py:307-327): per publication, Scholar
    * lookup → first 'results' entry whose bib_entry matches a branch;
    * 'Unknown' otherwise. Adds the publication_type column — the
    * reference's UPDATE would actually fail (no such column in the DDL);
    * we realize the intent via schema evolution.
    */
  def resolvePublicationTypes(spark: SparkSession, store: ArxivStore,
      client: ScholarClient): ArxivStore = {
    val pubs = store.publications
    val typed = Enrich.fetchResponses(spark,
        pubs.select(col("id"), col("title")), client, "title")
      .withColumn("parsed", from_json(col("response"), Scholar.responseSchema))
      .select(col("id"), posexplode_outer(col("parsed.results")).as(Seq("idx", "r")))
      .withColumn("ptype", extractPublicationType(col("r.bib_entry")))
      .groupBy(col("id"))
      .agg(min_by(col("ptype"), when(col("ptype").isNotNull, col("idx"))).as("ptype"))
      .select(col("id"), coalesce(col("ptype"), lit("Unknown")).as("publication_type"))
    store.copy(publications =
      pubs.join(typed, Seq("id"), "left")
        .withColumn("publication_type", coalesce(col("publication_type"), lit("Unknown"))))
  }

  /** F10 + resolve_author_names (py:331-336,373-392): per author, query
    * 'author:'+name (F7 concat), take the first result's first author
    * name, else 'Unknown'.
    */
  def resolveAuthorNames(spark: SparkSession, store: ArxivStore,
      client: ScholarClient): ArxivStore = {
    val authors = store.authors
    val resolved = Enrich.fetchResponses(spark,
        authors.select(col("id"),
          concat(lit("author:"), col("name")).as("q")), client, "q")
      .withColumn("parsed", from_json(col("response"), Scholar.responseSchema))
      // first result with a non-empty author list → its first name
      .select(col("id"), col("parsed.results").as("rs"))
      .withColumn("resolved",
        coalesce(
          element_at(filter(col("rs"), r => size(r("authors")) > 0), 1)
            .getField("authors").getItem(0),
          lit("Unknown")))
      .select(col("id"), col("resolved"))
    store.copy(authors =
      authors.join(resolved, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("resolved"), authors("name")).as("name"),
          col("affiliation")))
  }

  /** F9: normalize_fields_of_study (py:397-421) — the 21-entry mapping
    * with default 'Other'. Only 4 of the fixture's real arXiv codes are in
    * the map, so most categories collapse to 'Other' — preserved, not
    * fixed (the "sharper" behavior would break parity).
    */
  val categoryMapping: Seq[(String, String)] = Seq(
    "hep-ph" -> "High Energy Physics - Phenomenology",
    "quant-ph" -> "Quantum Physics",
    "cs.AI" -> "Computer Science - Artificial Intelligence",
    "cs.DB" -> "Computer Science - Databases",
    "math.AP" -> "Mathematics - Analysis of PDEs",
    "bio.GN" -> "Biology - Genomics",
    "chem.OC" -> "Chemistry - Organic Chemistry",
    "econ.TH" -> "Economics - Theory",
    "eng.EL" -> "Engineering - Electrical",
    "env.SCI" -> "Environmental Science",
    "geo.MET" -> "Geoscience - Meteorology",
    "hist" -> "History",
    "ling" -> "Linguistics",
    "med.ON" -> "Medicine - Oncology",
    "phil" -> "Philosophy",
    "phy.AP" -> "Physics - Astrophysics",
    "pol" -> "Political Science",
    "psy.CL" -> "Psychology - Clinical",
    "soc.SOC" -> "Sociology",
    "vet" -> "Veterinary Medicine",
    "edu" -> "Education")

  def normalizeFieldsOfStudy(spark: SparkSession, store: ArxivStore): ArxivStore = {
    import spark.implicits._
    val lookup = categoryMapping.toDF("category_name", "normalized")
    store.copy(categories =
      store.categories.join(broadcast(lookup), Seq("category_name"), "left")
        .select(col("id"),
          coalesce(col("normalized"), lit("Other")).as("category_name")))
  }
}
