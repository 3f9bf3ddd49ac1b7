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

  test("hotColdJoin matches plain join on an adversarial hot-token stream") {
    // q109's shape: the stream is an exploded token column where one
    // stopword dwarfs everything; the dim is the per-key frequency
    val stream = (Seq.tabulate(2000)(i => (i.toLong % 7, "the")) ++
      Seq.tabulate(200)(i => (i.toLong % 7, s"rare$i")))
      .toDF("doc_id", "tok")
    val tf = stream.groupBy($"tok").agg(count(lit(1)).as("ctf"))
    val plain = stream.join(tf, "tok")
      .select($"doc_id", $"tok", $"ctf")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val split = Skew.hotColdJoin(stream, tf, "tok", isHot = $"ctf" >= 100L)
      .select($"doc_id", $"tok", $"ctf")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(split == plain)
  }

  test("hotColdJoin assertConstantHot rejects a per-ROW hot predicate") {
    // a dim key with rows on both sides of the split (isHot depends on
    // the row, not the key) would silently lose its cold matches; the
    // opt-in guard must fail loudly instead
    val stream = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "k")
    val dim = Seq(("a", 1L), ("a", 500L), ("b", 2L)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Skew.hotColdJoin(stream, dim, "k", isHot = $"w" >= 100L,
        assertConstantHot = true)
    }
    // and a genuinely constant-per-key predicate passes the guard
    val ok = Skew.hotColdJoin(stream, dim, "k",
        isHot = $"k" === "a", assertConstantHot = true)
      .select($"doc_id", $"k", $"w").as[(Long, String, Long)]
      .collect().sorted.toSeq
    val plain = stream.join(dim, "k").select($"doc_id", $"k", $"w")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(ok == plain)
  }

  test("hotColdJoin with empty hot side degenerates to the plain join") {
    val tf = skewed.groupBy($"k").agg(count(lit(1)).as("ctf"))
    val plain = skewed.join(tf, "k").select($"k", $"v", $"ctf")
      .as[(String, Double, Long)].collect().sorted.toSeq
    val split = Skew.hotColdJoin(skewed, tf, "k", isHot = $"ctf" >= 100000L)
      .select($"k", $"v", $"ctf")
      .as[(String, Double, Long)].collect().sorted.toSeq
    assert(split == plain)
  }
}
