package graft

import graft.sources.IO
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S2/S3 JDBC paths exercised against embedded Derby (on the Spark
  * classpath) — a real JDBC round trip, no external database needed.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private val cfg = IO.JdbcConfig(
    url = "jdbc:derby:memory:graftdb;create=true",
    user = "app", password = "app",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().map(_.toString).toSeq

  private lazy val cust = Tables(spark, sf, "customer")
    .select($"c_custkey", $"c_name", $"c_acctbal")
    .filter($"c_custkey" <= 200)

  test("S3 batched write + S2 single-cursor read round-trip through Derby") {
    IO.writeJdbc(cust, cfg, "cust_rt", SaveMode.Overwrite, batchSize = 50)
    val back = IO.readJdbc(spark, cfg, "cust_rt")
    assert(sig(back) == sig(cust))
  }

  test("S2 partitioned read issues parallel range scans and loses nothing") {
    IO.writeJdbc(cust, cfg, "cust_part", SaveMode.Overwrite)
    val back = IO.readJdbc(spark, cfg, "cust_part",
      partitionColumn = Some("c_custkey"),
      lowerBound = 1, upperBound = 201, numPartitions = 8)
    // the read is split into 8 range queries (one per partition)...
    assert(back.rdd.getNumPartitions == 8)
    // ...that together cover every row exactly once (stride predicates
    // partition the key space; boundary rows appear in exactly one range)
    assert(sig(back) == sig(cust))
    // and more than one range actually carries rows
    val perPart = back.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 1)
  }

  test("readJdbc pushes filters down to the database query") {
    IO.writeJdbc(cust, cfg, "cust_push", SaveMode.Overwrite)
    val filtered = IO.readJdbc(spark, cfg, "cust_push")
      .filter($"c_custkey" <= 10).select($"c_custkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"))
    assert(filtered.count() == cust.filter($"c_custkey" <= 10).count())
  }
}
