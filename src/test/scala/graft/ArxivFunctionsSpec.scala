package graft

import graft.arxiv.{ArxivFunctions, Transforms}
import org.apache.spark.sql.functions._

class ArxivFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL UDFs agree with the Column-expression twins on all branches") {
    ArxivFunctions.registerAll(spark)
    val bibs = ("nothing" +: Seq("@article", "@inproceedings", "@book", "@thesis",
      "@techreport", "@manual", "@proceedings", "@unpublished", "@misc",
      "@phdthesis", "@mastersthesis", "@inbook", "@incollection", "@patent",
      "@online").map(m => s"entry $m {x}")).toDF("bib")
    bibs.createOrReplaceTempView("bibs")
    val viaSql = spark.sql(
      "SELECT extract_publication_type(bib) FROM bibs").as[String].collect().toSeq
    val viaCol = bibs.select(
      coalesce(Transforms.extractPublicationType($"bib"), lit("Unknown")))
      .as[String].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("normalize_category maps known codes and defaults to Other") {
    ArxivFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT normalize_category('hep-ph'), normalize_category('cs.CV')")
      .as[(String, String)].head()
    assert(r == (("High Energy Physics - Phenomenology", "Other")))
  }

  test("extract_citation_author mirrors F4 split-dash-first semantics") {
    ArxivFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT extract_citation_author('A Author - Journal, 2020'), " +
        "extract_citation_author('no dash here')")
      .as[(String, String)].head()
    assert(r == (("A Author", "Unknown")))
  }
}
