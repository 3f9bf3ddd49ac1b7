// Hosted under org.apache.spark.sql.* to access the private[sql] expression
// APIs (AbstractDataType, ExpressionUtils) — the standard pattern for
// third-party native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path. The built-in
  * route (`aggregate(zip_with(a, b, _*_), 0, _+_)`) allocates lambda
  * frames per element and breaks whole-stage codegen; a pairwise dot over
  * millions of candidate pairs then spends more time in the interpreter
  * than in arithmetic. These generate a tight primitive loop instead.
  */
abstract class ArrayDot extends BinaryExpression with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true

  protected def elemType: DataType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(elemType), ArrayType(elemType))

  protected def javaElem: String
  protected def getter: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: the same expression may be generated several times
      // into one codegen scope (e.g. norm + dot in one projection)
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$javaElem $acc = ($javaElem) 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.$getter($i) * $b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** dot(array<long>, array<long>) → long — exact integer arithmetic for
  * quantized embeddings (engine-portable oracle determinism).
  */
case class LongDot(left: Expression, right: Expression) extends ArrayDot {
  override def dataType: DataType = LongType
  override protected def elemType: DataType = LongType
  override protected def javaElem: String = "long"
  override protected def getter: String = "getLong"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(array<double>, array<double>) → double. */
case class DoubleDot(left: Expression, right: Expression) extends ArrayDot {
  override def dataType: DataType = DoubleType
  override protected def elemType: DataType = DoubleType
  override protected def javaElem: String = "double"
  override protected def getter: String = "getDouble"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {

  def dot_long(a: Column, b: Column): Column =
    ExpressionUtils.column(LongDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot_double(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL registration: `SELECT dot_long(a, b)` / `dot_double(a, b)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_long", exprs => LongDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_double", exprs => DoubleDot(exprs.head, exprs(1)), "scala_udf")
  }
}
