package graft

import graft.operators.{AuditDiff, Constraints, Relational}
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, Option("a"), Option(10.0)),
    (2L, Option("b"), None),
    (3L, None, Option(30.0))).toDF("id", "name", "score")

  test("merge: matched rows resolve per column, unmatched delta inserts, base passes through") {
    val delta = Seq(
      (2L, Option.empty[String], Option(99.0)), // update id=2: name null (coalesce keeps 'b')
      (9L, Option("new"), Option(1.0))).toDF("id", "name", "score")
    val out = Relational.merge(base, delta, Seq("id"),
      Map("score" -> Relational.Overwrite)).orderBy("id")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(99.0)),
      (3L, None, Some(30.0)),
      (9L, Some("new"), Some(1.0))))
  }

  test("merge: Overwrite propagates delta nulls; KeepOld ignores delta") {
    val delta = Seq((1L, Option.empty[String], Option(7.0))).toDF("id", "name", "score")
    val out = Relational.merge(base, delta, Seq("id"),
      Map("name" -> Relational.Overwrite, "score" -> Relational.KeepOld))
      .filter($"id" === 1).as[(Long, Option[String], Option[Double])].head()
    assert(out == ((1L, None, Some(10.0))))
  }

  test("merge is idempotent: applying the same delta twice is a no-op") {
    val delta = Seq((2L, Option("b2"), Option(5.0)), (9L, Option("n"), None))
      .toDF("id", "name", "score")
    val once = Relational.merge(base, delta, Seq("id"))
    val twice = Relational.merge(once, delta, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("dedupByKey: null keys all survive, non-null keep first by tiebreak") {
    val df = Seq((1L, Option("k")), (2L, Option("k")), (3L, None),
      (4L, None), (5L, Option("j"))).toDF("id", "k")
    val out = Relational.dedupByKey(df, "k", Seq($"id".asc))
      .orderBy("id").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, Some("k")), (3L, None), (4L, None), (5L, Some("j"))))
  }

  test("allocateIds: dense, ordered, starting after max") {
    val out = Relational.allocateIds(Seq("c", "a", "b").toDF("name"), "name", 100L)
      .as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((101L, "a"), (102L, "b"), (103L, "c")))
  }

  test("upsertDim: only unseen names get new ids; existing rows unchanged") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val incoming = Seq("b", "c", "c", "d").toDF("name")
    val out = Relational.upsertDim(dim, incoming, "name")
      .as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("upsertDim is idempotent") {
    val dim = Seq((1L, "a")).toDF("id", "name")
    val incoming = Seq("a", "b").toDF("name")
    val once = Relational.upsertDim(dim, incoming, "name")
    val twice = Relational.upsertDim(once, incoming, "name")
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("topKPerGroup keeps k rows per group in order") {
    val df = Seq(("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, Seq($"g"), Seq($"v".desc), 2)
      .select("g", "v").as[(String, Int)].collect().toSet
    assert(out == Set(("g1", 3), ("g1", 2), ("g2", 9)))
  }

  test("auditDiff classifies insert/update/delete and serializes JSON") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val nw = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val out = AuditDiff.diff(old, nw, "id", "t", clock = lit("2026-01-01 00:00:00").cast("timestamp"))
    val rows = out.select($"operation", $"pk".cast("long"), $"old_values", $"new_values")
      .as[(String, Long, Option[String], Option[String])].collect().toSet
    assert(rows == Set(
      ("UPDATE", 2L, Some("""{"id":2,"v":"b"}"""), Some("""{"id":2,"v":"B"}""")),
      ("DELETE", 3L, Some("""{"id":3,"v":"c"}"""), None),
      ("INSERT", 4L, None, Some("""{"id":4,"v":"d"}"""))))
  }

  test("constraints: unique counts excess non-null dups; pk adds null keys; fk counts orphans") {
    val df = Seq(Option(1), Option(1), Option(1), Option(2), None, None).toDF("k")
    assert(Constraints.unique(df, Seq("k"), "u").select("violations").as[Long].head() == 2L)
    assert(Constraints.primaryKey(df, Seq("k"), "pk").select("violations").as[Long].head() == 4L)
    val parent = Seq(1, 2).toDF("pid")
    val child = Seq(Option(1), Option(3), None).toDF("k")
    assert(Constraints.foreignKey(child, "k", parent, "pid", "fk")
      .select("violations").as[Long].head() == 1L)
  }
}
