package graft

import graft.sources.IO
import org.apache.spark.sql.functions._

class IOSpec extends SparkSpec {
  import spark.implicits._

  test("byteBudgetPrefix: keeps the longest prefix within budget, excludes crossing row") {
    val df = Seq.tabulate(50)(i => (i.toLong, "x" * 20)).toDF("id", "payload")
    val rowBytes = length(to_json(struct($"id", $"payload"))).cast("long") + 1
    val sizes = df.select(rowBytes).as[Long].collect()
    val budget = sizes.take(7).sum + sizes(7) / 2 // lands mid-row 8
    val out = IO.byteBudgetPrefix(df, budget)
    assert(out.select("id").as[Long].collect().toSeq == (0L until 7L))
  }

  test("byteBudgetPrefix: zero budget → empty; huge budget → everything") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(IO.byteBudgetPrefix(df, 0L).count() == 0)
    assert(IO.byteBudgetPrefix(df, 1L << 30).count() == 2)
  }

  test("byteBudgetPrefix matches the reference cut on the arxiv fixture") {
    val input = arxiv.Ingest.readArxivJson(spark,
      getClass.getResource("/dataset.json").getPath)
    // 40 KiB budget (createdataset.py:9) over the 30-record fixture keeps
    // a strict prefix in file order
    val kept = IO.byteBudgetPrefix(input.drop("input_idx"), 40 * 1024)
    val ids = kept.select($"id").as[String].collect().toSeq
    val all = input.orderBy($"input_idx").select($"id").as[String].collect().toSeq
    assert(ids == all.take(ids.length))
    assert(ids.nonEmpty)
  }

  test("schema-first readers: json array and csv round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("io_spec").toString
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "v")
    IO.writeParquet(df, s"$tmp/p")
    assert(IO.readParquet(spark, s"$tmp/p").count() == 2)
    df.write.option("header", true).csv(s"$tmp/c")
    val back = IO.readCsv(spark, s"$tmp/c", df.schema)
    assert(back.as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (2L, None)))
    IO.writeCsv(df, s"$tmp/c2")
    assert(IO.readCsv(spark, s"$tmp/c2", df.schema).count() == 2)
  }

  test("orc round-trip with partitioned layout and pushdown") {
    val tmp = java.nio.file.Files.createTempDirectory("io_orc").toString
    val df = Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    IO.writeOrc(df, s"$tmp/o", partitionBy = Seq("o_orderpriority"))
    val back = IO.readOrc(spark, s"$tmp/o")
    assert(back.count() == df.count())
    // partition column became a directory key → partition pruning
    val pruned = back.filter($"o_orderpriority" === "1-URGENT")
    assert(pruned.count() == df.filter($"o_orderpriority" === "1-URGENT").count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"))
  }

  test("extension-injected SQL functions resolve via spark.sql") {
    org.apache.spark.sql.graft.VectorExpressions.register(spark)
    val r = spark.sql("SELECT dot_long(array(1L,2L,3L), array(4L,5L,6L)) AS d," +
      " dot_double(array(1.0,2.0), array(3.0,4.0)) AS e")
      .as[(Long, Double)].head()
    assert(r == ((32L, 11.0)))
  }
}
