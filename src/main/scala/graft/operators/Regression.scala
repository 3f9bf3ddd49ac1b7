package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment linear models — the regression sibling of [[Pca]]'s
  * moment pass. Extension surface: the reference has no model-fitting
  * operators.
  *
  * Split the established way for engine-exactness: the FIT is a
  * driver-side solve of the (p+1)×(p+1) normal equations accumulated
  * from ONE distributed pass of exact INTEGER moments (partial
  * aggregation ⇒ the shuffle is p² scalars regardless of row count),
  * and the learned weights then travel as micro-quantized integer
  * LITERALS — so the scoring pass (the part that touches all the data)
  * is an exact integer dot product any engine reproduces bit-for-bit.
  */
object Regression {

  /** A fitted ridge model over integer features: intercept-first
    * micro-quantized weights (wMicro(0) = intercept, wMicro(j) =
    * weight of xCols(j-1), in 1e-6 target units per feature unit).
    */
  final case class RidgeFit(xCols: Seq[String], wMicro: Seq[Long],
      lambda: Double)

  /** Fit ridge regression by the normal equations
    * (XᵀX + λI)·w = Xᵀy over LONG feature/target columns (quantize
    * first — cents, counts — the usual integer discipline).
    *
    * One aggregation emits the exact integer sums Σxⱼxₖ (upper
    * triangle + intercept row) and Σxⱼy; the driver then runs
    * Gaussian elimination with partial pivoting in IEEE doubles —
    * deterministic (fixed pivot rule, correctly-rounded ops, no libm)
    * — and rounds the solution to micro literals. λ is NOT applied to
    * the intercept row (standard ridge).
    *
    * Overflow bound: every moment is < max|xⱼ|·max|xₖ|·n; with
    * cents-scale features (≲2e5) this holds to n ≈ 4e6 rows — past
    * that, cast the sum expressions to DECIMAL(38,0) (the same
    * documented swap as [[Pca]]'s moments).
    */
  def fitRidge(df: DataFrame, yCol: String, xCols: Seq[String],
      lambda: Double = 0.0): RidgeFit = {
    require(xCols.nonEmpty, "fitRidge needs at least one feature")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val p = xCols.size + 1 // intercept-first design column x0 = 1
    def x(i: Int): Column =
      if (i == 0) lit(1L) else col(xCols(i - 1)).cast("long")
    val aggs =
      (for { i <- 0 until p; j <- i until p }
        yield sum(x(i) * x(j)).as(s"a_${i}_$j")) ++
      (0 until p).map(i => sum(x(i) * col(yCol).cast("long")).as(s"b_$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val a = Array.ofDim[Double](p, p)
    val b = Array.ofDim[Double](p)
    var k = 0
    for { i <- 0 until p; j <- i until p } {
      a(i)(j) = row.getLong(k).toDouble
      a(j)(i) = a(i)(j)
      k += 1
    }
    for (i <- 0 until p) { b(i) = row.getLong(k).toDouble; k += 1 }
    for (i <- 1 until p) a(i)(i) += lambda // no penalty on the intercept
    // Gaussian elimination, partial pivoting: fixed deterministic order
    for (c0 <- 0 until p) {
      val piv = (c0 until p).maxBy(r0 => math.abs(a(r0)(c0)))
      require(math.abs(a(piv)(c0)) > 0.0,
        s"fitRidge: singular normal matrix at column $c0 — " +
          s"raise lambda or drop a collinear feature")
      if (piv != c0) {
        val tr = a(piv); a(piv) = a(c0); a(c0) = tr
        val tb = b(piv); b(piv) = b(c0); b(c0) = tb
      }
      for (r0 <- c0 + 1 until p) {
        val f = a(r0)(c0) / a(c0)(c0)
        for (cc <- c0 until p) a(r0)(cc) -= f * a(c0)(cc)
        b(r0) -= f * b(c0)
      }
    }
    val w = Array.ofDim[Double](p)
    for (r0 <- (p - 1) to 0 by -1) {
      var s = b(r0)
      for (cc <- r0 + 1 until p) s -= a(r0)(cc) * w(cc)
      w(r0) = s / a(r0)(r0)
    }
    RidgeFit(xCols, w.map(v => Math.round(v * 1e6)).toSeq, lambda)
  }

  /** Score with the fitted literals: adds `pred_micro` (Σ wⱼᵐⁱᶜʳᵒ·xⱼ,
    * exact BIGINT, in 1e-6 target units) and `resid_micro`
    * (y·10⁶ − pred_micro). Pure codegen'd integer arithmetic — the
    * literal-weights dot product any engine replays.
    */
  def scoreResiduals(df: DataFrame, yCol: String, fit: RidgeFit): DataFrame = {
    val pred = fit.wMicro.zipWithIndex.map { case (w, i) =>
      if (i == 0) lit(w)
      else lit(w) * col(fit.xCols(i - 1)).cast("long")
    }.reduce(_ + _)
    df.withColumn("pred_micro", pred)
      .withColumn("resid_micro",
        col(yCol).cast("long") * lit(1000000L) - col("pred_micro"))
  }
}
