package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed =
    (Seq.fill(500)(("hot", 1.0)) ++ Seq.tabulate(50)(i => (s"k$i", 2.0)))
      .toDF("k", "v")

  test("saltedAggregate matches plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("s"), count(lit(1)).as("c"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), 8,
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      combine = Seq(sum($"s").as("s"), sum($"c").as("c")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin matches plain join") {
    val dim = (Seq(("hot", "H")) ++ Seq.tabulate(50)(i => (s"k$i", s"D$i")))
      .toDF("k", "d")
    val plain = skewed.join(dim, Seq("k")).select($"k", $"v", $"d")
      .as[(String, Double, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", 8).select($"k", $"v", $"d")
      .as[(String, Double, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin left-outer keeps unmatched rows exactly once") {
    val dim = Seq(("hot", "H")).toDF("k", "d")
    val out = Skew.saltedJoin(skewed, dim, "k", 4, "left_outer")
    assert(out.count() == skewed.count())
    assert(out.filter($"d".isNull).count() == 50)
  }

  test("skewedKeys flags only the hot key") {
    val hot = Skew.skewedKeys(skewed, "k", 100).select($"k").as[String].collect().toSeq
    assert(hot == Seq("hot"))
  }
}
