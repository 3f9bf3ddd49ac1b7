package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-capture without triggers (SURVEY.md §2.10 C1): the reference logs
  * every INSERT/UPDATE/DELETE on `publications` via a Postgres row trigger
  * into `log_table` (aupostgres.sql:82-97). Spark has no triggers, so change
  * capture becomes a snapshot diff around each table rewrite: full-outer
  * join old vs new on the primary key, classify, serialize both sides as
  * JSON (`row_to_json` ≙ `to_json(struct(*))`).
  *
  * One shuffle on the PK; both snapshot scans are column-pruned to the
  * compared columns. The full-outer join here is unavoidable (we need rows
  * existing on either side) and is keyed on the PK, so AQE handles skew.
  */
object AuditDiff {

  /** Rows: (table_name, operation, pk, old_values, new_values, operation_time).
    * `operation` ∈ INSERT | UPDATE | DELETE; unchanged rows are dropped.
    * Pass a literal `clock` for deterministic tests (defaults to
    * `current_timestamp()`, matching the trigger's CURRENT_TIMESTAMP).
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      pk: String,
      tableName: String,
      clock: Column = current_timestamp()): DataFrame = {
    val cols = oldSnap.columns.toSeq
    require(newSnap.columns.toSeq == cols, "snapshots must share a schema")
    val o = oldSnap.select(struct(cols.map(col): _*).as("__old"))
      .select(col("__old"), col(s"__old.$pk").as("__opk"))
    val n = newSnap.select(struct(cols.map(col): _*).as("__new"))
      .select(col("__new"), col(s"__new.$pk").as("__npk"))
    o.join(n, o("__opk") === n("__npk"), "full_outer")
      .withColumn("operation",
        when(col("__opk").isNull, "INSERT")
          .when(col("__npk").isNull, "DELETE")
          .when(not(col("__old") <=> col("__new")), "UPDATE"))
      .filter(col("operation").isNotNull)
      .select(
        lit(tableName).as("table_name"),
        col("operation"),
        coalesce(col("__opk"), col("__npk")).as("pk"),
        when(col("__old").isNotNull, to_json(col("__old"))).as("old_values"),
        when(col("__new").isNotNull, to_json(col("__new"))).as("new_values"),
        clock.as("operation_time"))
  }
}
