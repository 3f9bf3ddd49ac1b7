package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §7 extended surface) — not in the
  * oracle catalog (HLL/quantile sketches aren't engine-portable), so
  * their error bounds are pinned here instead.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables(spark, sf, "lineitem")
    val (approx, exact) = li.agg(
      approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx percentile brackets the exact median") {
    val li = Tables(spark, sf, "lineitem")
    val approxMedian = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    assert(math.abs(approxMedian - exact) / exact < 0.05)
  }

  test("graft SQL functions resolve in a fresh session via the registry route") {
    val s2 = spark.newSession()
    org.apache.spark.sql.graft.VectorExpressions.register(s2)
    val r = s2.sql("SELECT dot_long(array(2L,3L), array(4L,5L))").head().getLong(0)
    assert(r == 23L)
  }
}
