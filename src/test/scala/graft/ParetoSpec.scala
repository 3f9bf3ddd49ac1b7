package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier: agreement with the quadratic dominance
  * definition, duplicate/tie handling, partitioning invariance.
  */
class ParetoSpec extends SparkSpec {
  import spark.implicits._

  private val pts = Seq(
    (1L, 1L, 9L),  // dominated by 2 (x strict, y equal)
    (2L, 3L, 9L),  // frontier (best y)
    (3L, 5L, 5L),  // frontier
    (4L, 5L, 5L),  // duplicate of 3 — both survive
    (5L, 5L, 4L),  // dominated by 3 (same x, lower y)
    (6L, 2L, 8L),  // dominated by 2 (3≥2, 9≥8, strict)
    (7L, 7L, 1L),  // frontier (best x)
    (8L, 6L, 1L)   // dominated by 7
  ).toDF("id", "x", "y")

  private def dominanceOracle(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.collect { case (id, x, y)
      if !rows.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) } => id
    }.toSet

  test("matches the quadratic dominance definition, keeps duplicates, drops same-x losers") {
    val got = Relational.paretoFrontier2(pts, "x", "y")
      .select($"id").as[Long].collect().toSet
    val want = dominanceOracle(pts.as[(Long, Long, Long)].collect().toSeq)
    assert(got == want)
    assert(got == Set(2L, 3L, 4L, 7L), s"frontier was $got")
  }

  test("agrees with the dominance definition on real parts data") {
    val parts = Tables(spark, sf, "part")
      .select($"p_partkey".as("id"), $"p_size".cast("long").as("x"),
        round($"p_retailprice" * 100).cast("long").as("y"))
    val got = Relational.paretoFrontier2(parts, "x", "y")
      .select($"id").as[Long].collect().toSet
    val want = dominanceOracle(parts.as[(Long, Long, Long)].collect().toSeq)
    assert(got == want && got.nonEmpty)
  }

  test("partitioning does not change the frontier") {
    val a = Relational.paretoFrontier2(pts, "x", "y")
      .select($"id").as[Long].collect().toSet
    val b = Relational.paretoFrontier2(pts.repartition(7), "x", "y")
      .select($"id").as[Long].collect().toSet
    assert(a == b)
  }
}
