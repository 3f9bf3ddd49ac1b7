package graft

import graft.operators.Regression

/** Exact-moment ridge regression: recovery on exactly-linear data,
  * shrinkage under λ, singularity guard, determinism.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exact linear relation with zero residuals") {
    // y = 7 + 3·x1 − 2·x2, integers throughout
    val rows = for { x1 <- 0L to 20L; x2 <- 0L to 10L }
      yield (x1, x2, 7L + 3 * x1 - 2 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val fit = Regression.fitRidge(df, "y", Seq("x1", "x2"))
    assert(fit.wMicro == Seq(7000000L, 3000000L, -2000000L),
      s"expected exact micro weights, got ${fit.wMicro}")
    val resid = Regression.scoreResiduals(df, "y", fit)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.col("resid_micro"))))
      .head().getLong(0)
    assert(resid == 0L)
  }

  test("ridge penalty shrinks the slope toward zero") {
    val rows = (0L to 50L).map(x => (x, 10 * x))
    val df = rows.toDF("x1", "y")
    val w0 = Regression.fitRidge(df, "y", Seq("x1")).wMicro(1)
    val wBig = Regression.fitRidge(df, "y", Seq("x1"), lambda = 1e6).wMicro(1)
    assert(w0 == 10000000L)
    assert(wBig < w0 && wBig > 0L, s"λ must shrink: $wBig vs $w0")
  }

  test("a perfectly collinear duplicate feature is singular at λ=0, solvable with ridge") {
    val df = (1L to 30L).map(x => (x, x, 5 * x)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Regression.fitRidge(df, "y", Seq("x1", "x2"))
    }
    // the ridge-regularized normal matrix is nonsingular; the two
    // collinear features split the slope symmetrically, shrunk below
    // the OLS value (with centered Sxx ≈ 2247.5 and λ = 1e3, the
    // combined slope is 5 · 2Sxx/(2Sxx + λ) ≈ 4.09)
    val fit = Regression.fitRidge(df, "y", Seq("x1", "x2"), lambda = 1e3)
    assert(fit.wMicro(1) > 0L && fit.wMicro(2) > 0L)
    assert(math.abs(fit.wMicro(1) - fit.wMicro(2)) <= 1L)
    val sum = fit.wMicro(1) + fit.wMicro(2)
    assert(sum > 3000000L && sum < 5000000L,
      s"combined slope must shrink below OLS, got $sum")
  }

  test("fit is deterministic across runs and partitionings") {
    val rows = (1L to 500L).map(i => (i % 37, (i * i) % 101, i % 17 + 3 * (i % 37)))
    val a = Regression.fitRidge(rows.toDF("x1", "x2", "y"), "y",
      Seq("x1", "x2"), lambda = 10.0)
    val b = Regression.fitRidge(rows.toDF("x1", "x2", "y").repartition(11),
      "y", Seq("x1", "x2"), lambda = 10.0)
    assert(a == b)
  }
}
