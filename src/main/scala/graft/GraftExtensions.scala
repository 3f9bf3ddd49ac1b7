package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DoubleDot, LongDot}

/** SparkSessionExtensions entry point: makes the graft native functions
  * available to ANY session via config — no code changes for SQL users:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT dot_long(a, b), dot_double(x, y) FROM vectors
  * }}}
  *
  * (Extension-injected functions are the supported path for a library —
  * the alternative, session-local `createOrReplaceTempFunction`, is also
  * exposed as [[org.apache.spark.sql.graft.VectorExpressions.register]].)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[LongDot].getName, "dot_long"),
      (exprs: Seq[Expression]) => LongDot(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DoubleDot].getName, "dot_double"),
      (exprs: Seq[Expression]) => DoubleDot(exprs.head, exprs(1))))
  }
}
