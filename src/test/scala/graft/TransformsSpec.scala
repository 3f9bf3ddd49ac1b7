package graft

import graft.arxiv._
import org.apache.spark.sql.functions._

/** The three commented-out-in-the-reference transform stages (D2), run
  * e2e with all optional stages enabled.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = getClass.getResource("/dataset.json").getPath
  private val clock = to_date(lit("2026-01-15"))

  private lazy val result = Pipeline.run(spark,
    PipelineConfig(inputPath = fixture,
      enableResolvePublicationTypes = true,
      enableResolveAuthorNames = true,
      enableNormalizeFieldsOfStudy = true), clock = clock)

  test("resolve_publication_types adds the publication_type column (schema evolution)") {
    val pubs = result.store.publications
    assert(pubs.columns.contains("publication_type"))
    val types = pubs.select($"publication_type").distinct().as[String].collect().toSet
    // mock bib entries are all @article → Journal Article everywhere;
    // enrich-inserted rows resolved after the stage keep their value too
    assert(types.subsetOf(Set("Journal Article", "Unknown")))
    assert(types.contains("Journal Article"))
  }

  test("resolve_author_names rewrites names from scholar results") {
    val names = result.store.authors.select($"name").as[String].collect()
    // mock resolver returns "A <hex3>" style names
    assert(names.nonEmpty && names.exists(_.startsWith("A ")))
    assert(result.store.authors.filter($"name".isNull).count() == 0)
  }

  test("normalize_fields_of_study collapses unmapped categories to Other") {
    val cats = result.store.categories.select($"category_name").as[String].collect().toSet
    assert(cats.contains("Other"))
    // the fixture's mapped codes survive under their normalized names
    assert(cats.subsetOf(Transforms.categoryMapping.map(_._2).toSet + "Other"))
  }

  test("validation still runs after schema evolution") {
    assert(result.validation.count() > 0)
  }
}
