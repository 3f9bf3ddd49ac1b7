package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative constraints as violation-finding queries (SURVEY.md §2.9 V4).
  *
  * Postgres enforces NOT NULL / CHECK / UNIQUE / FK / PK at write time
  * (aupostgres.sql:1-67); Spark enforces nothing, so each constraint becomes
  * a DataFrame that counts violating rows, run as a pipeline stage. Each
  * check is one scan + (for UNIQUE/FK) one keyed shuffle; the final report
  * is a union of single-row frames.
  */
object Constraints {

  sealed trait Constraint { def name: String; def violations(df: DataFrame): Column }

  /** CHECK (pred) — count rows where the predicate is strictly FALSE.
    * SQL CHECK semantics: a NULL predicate result PASSES (Postgres
    * accepts the row), so nulls are not violations — use [[NotNull]] for
    * null rejection.
    */
  final case class Check(name: String, pred: Column) extends Constraint {
    def violations(df: DataFrame): Column =
      count(when(coalesce(pred, lit(true)) === false, 1))
  }

  final case class NotNull(colName: String) extends Constraint {
    val name = s"not_null_$colName"
    def violations(df: DataFrame): Column = count(when(col(colName).isNull, 1))
  }

  /** Evaluate scan-shaped constraints (CHECK / NOT NULL) in ONE pass. */
  def scanReport(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    val aggs = cs.map(c => c.violations(df).as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // one row of counts → long form (constraint, violations)
    row.select(cs.map(c =>
      struct(lit(c.name).as("constraint_name"), col(c.name).as("violations")).as(c.name)): _*)
      .select(explode(array(cs.map(c => col(c.name)): _*)).as("r"))
      .select(col("r.constraint_name"), col("r.violations"))
  }

  /** UNIQUE(cols) with SQL null semantics: rows whose key contains a null
    * never conflict (nulls compare distinct). Violations = excess rows.
    */
  def unique(df: DataFrame, cols: Seq[String], name: String): DataFrame = {
    val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
    df.filter(nonNull)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("constraint_name"), col("violations"))
  }

  /** Composite PK = UNIQUE + all columns NOT NULL. Violations = dup excess
    * plus rows with any null key part.
    */
  def primaryKey(df: DataFrame, cols: Seq[String], name: String): DataFrame = {
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    val nullCount = df.agg(count(when(anyNull, 1)).as("n"))
    val dups = unique(df, cols, name)
    dups.crossJoin(nullCount)
      .select(col("constraint_name"), (col("violations") + col("n")).as("violations"))
  }

  /** FOREIGN KEY child(childCol) → parent(parentCol): count non-null child
    * keys with no parent (left anti join — SURVEY §2.3 J5).
    */
  def foreignKey(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, name: String): DataFrame = {
    // aliased parent key: the child may carry a same-named column
    val p = parent.select(col(parentCol).as("__fk_parent"))
    child.filter(col(childCol).isNotNull)
      .join(p, col(childCol) === col("__fk_parent"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("constraint_name"), col("violations"))
  }

  /** Union the individual reports into (constraint, violations). */
  def report(parts: Seq[DataFrame]): DataFrame = parts.reduce(_.unionByName(_))
}
