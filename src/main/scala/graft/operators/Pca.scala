package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-integer PCA over an embedding column — the dimensionality-
  * reduction step a 100 TB embedding pipeline runs before indexing
  * (Jégou et al. use a PCA rotation ahead of PQ; SemDeDup-style
  * pipelines project before clustering). Extension surface: the
  * reference has no vector operators at all.
  *
  * Split the classic way for engine-exactness, like IVF/PQ training
  * ([[Similarity.trainCentroids]]) and the DSIR weights: the FIT is a
  * driver-side eigendecomposition of a d×d matrix accumulated from ONE
  * distributed pass of exact integer moments, and the learned basis
  * then travels as micro-quantized integer LITERALS — so the projection
  * itself (the part that touches all the data) is an exact integer dot
  * product any engine reproduces bit-for-bit.
  *
  *  - moments: vectors milli-quantize ([[Similarity.quantize]]); the
  *    pass emits the d(d+1)/2 upper-triangle second moments and the d
  *    first moments as integer sums (partial aggregation makes the
  *    shuffle ~2 k rows regardless of corpus size; terms < 2²³·n, so
  *    BIGINT holds to n ≈ 10¹² vectors — past that swap the sums to
  *    DECIMAL(38,0));
  *  - fit (driver): covariance from the exact sums, then a CYCLIC
  *    JACOBI eigensolver (deterministic: fixed sweep order, fixed
  *    rotation formulas, IEEE sqrt only — no libm transcendentals);
  *    eigenvectors ordered by (eigenvalue desc, index asc), sign-fixed
  *    so each vector's largest-|component| entry is positive;
  *  - project: p_j = Σ_k (vm_k − mean_k)·b_jk with the milli mean and
  *    micro basis as literals — every term < 2⁴², the sum exact in
  *    BIGINT and below 2⁵³ (so a DuckDB double `list_dot_product`
  *    reproduces it losslessly).
  */
object Pca {

  /** A fitted model: milli-quantized mean, micro-quantized basis rows
    * (r × d, row j = component j), and the eigenvalues (milli² units)
    * for variance-explained reporting.
    */
  final case class PcaModel(meanMilli: Array[Long],
      basisMicro: Array[Array[Long]], eigvals: Array[Double])

  /** The exact integer MOMENT relation of an embedding column — the
    * sufficient statistics of [[fit]] as mergeable rows (i, j, v):
    *
    *   (i,  j, Σ x_i·x_j)  for 0 ≤ i ≤ j   (upper-triangle seconds)
    *   (i, −1, Σ x_i)                       (firsts)
    *   (−1, −1, n)                          (the count)
    *
    * Merge = SUM of `v` per (i, j) — integer addition, so K slice
    * moments merged equal the bulk pass exactly (the q130/q143
    * additive-state idea applied to model sufficient statistics; this
    * is what the streaming twin writes per batch).
    */
  def momentsOf(df: DataFrame, vecCol: String): DataFrame = {
    val vm = df.select(Similarity.quantize(col(vecCol)).as("vm"))
      .where(col("vm").isNotNull)
    val seconds = vm
      .select(col("vm"), posexplode(col("vm")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"),
        posexplode(col("vm")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("v"))
    // firsts carry their per-dim counts as (i, −2, c) rows so a merged
    // fit can still reject ragged vector dimensions
    val firsts = vm.select(posexplode(col("vm")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("c"))
    val n = vm.agg(count(lit(1)).as("v"))
      .select(lit(-1).as("i"), lit(-1).as("j"), col("v"))
    seconds
      .unionByName(firsts.select(col("i"), lit(-1).as("j"), col("s").as("v")))
      .unionByName(firsts.select(col("i"), lit(-2).as("j"), col("c").as("v")))
      .unionByName(n)
  }

  /** One distributed pass of exact integer moments, then the driver
    * eigensolve. `r` = number of components to keep (1 ≤ r ≤ d).
    */
  def fit(df: DataFrame, vecCol: String, r: Int): PcaModel =
    fitFromMoments(momentsOf(df, vecCol), r)

  /** The driver eigensolve over a (possibly merged) moment relation —
    * rows are summed per (i, j) first, so per-batch moment partitions
    * feed in unmerged.
    */
  def fitFromMoments(moments: DataFrame, r: Int): PcaModel = {
    require(r >= 1, s"r must be >= 1, got $r")
    val rows = moments.groupBy(col("i"), col("j"))
      .agg(sum(col("v")).as("v")).collect()
      .map(row => ((row.getInt(0), row.getInt(1)), row.getLong(2))).toMap
    require(rows.nonEmpty, "fit: no vectors")
    val n = rows.getOrElse((-1, -1),
      throw new IllegalArgumentException("fit: count row missing"))
    require(n > 0, "fit: no vectors")
    val d = rows.keys.collect { case (i, -1) if i >= 0 => i }.max + 1
    require(r <= d, s"r=$r exceeds dim $d")
    require((0 until d).forall(i => rows.getOrElse((i, -2), -1L) == n),
      "fit: ragged vector dimensions — every vector must have the same dim")
    val sums = Array.tabulate(d)(i => rows.getOrElse((i, -1), 0L))
    val sxx = Array.ofDim[Long](d, d)
    for (i <- 0 until d; j <- i until d) {
      val v = rows.getOrElse((i, j), 0L)
      sxx(i)(j) = v; sxx(j)(i) = v
    }
    // covariance in doubles from the exact sums (driver-only — the
    // result becomes literals, so cross-engine floating repro is moot)
    val nd = n.toDouble
    val cov = Array.tabulate(d, d) { (i, j) =>
      sxx(i)(j) / nd - (sums(i) / nd) * (sums(j) / nd)
    }
    val (vals, vecs) = jacobi(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(r)
    val basis = order.map { c =>
      val v = Array.tabulate(d)(k => vecs(k)(c))
      // deterministic sign: largest-|entry| positive, first index wins
      val pivot = v.indices.maxBy(k => (math.abs(v(k)), -k))
      val s = if (v(pivot) < 0) -1.0 else 1.0
      v.map(x => math.round(x * s * 1e6))
    }.toArray
    PcaModel(sums.map(s => math.round(s.toDouble / nd)), basis,
      order.map(vals).toArray)
  }

  /** Project onto the fitted basis: (idCol, p_0 … p_{r−1}) exact-integer
    * coordinates (milli·micro units). Scan-linear, no shuffle; the
    * model is literals, so the projection inlines into whole-stage
    * codegen.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val vm = Similarity.quantize(col(vecCol))
    val centered = zip_with(vm,
      array(model.meanMilli.map(lit(_)): _*), (x, m) => x - m)
    val cols = model.basisMicro.zipWithIndex.map { case (b, j) =>
      aggregate(
        zip_with(centered, array(b.map(lit(_)): _*), (x, w) => x * w),
        lit(0L), (acc: Column, x: Column) => acc + x).as(s"p$j")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** OPQ-style rotation for the PQ stack (Ge et al., "Optimized
    * Product Quantization", CVPR 2013 — the parametric variant:
    * rotate by the PCA basis, then BALANCE variance across the PQ
    * subspaces by interleaving components): project the milli vector
    * onto the FULL-RANK basis, floor back to milli scale, and emit
    * the exact-integer-over-1000 double array that
    * [[Similarity.quantize]] round-trips losslessly. The basis is
    * orthonormal, so L2 geometry is preserved up to the 1-milli
    * rounding; what changes is the COORDINATES the PQ subspaces cut.
    * With `balance = nSub`, output position k carries component
    * (k % dsub) · nSub + k / dsub — each contiguous dsub-slice
    * (= one PQ subspace) gets an even mix of high- and low-variance
    * components instead of subspace 0 hoarding all the variance the
    * plain eigenvalue order would give it.
    */
  def rotateForPq(vecCol: Column, model: PcaModel,
      balance: Int = 1): Column = {
    val d = model.basisMicro.length
    require(balance >= 1 && d % balance == 0,
      s"balance $balance must divide the basis rank $d")
    val dsub = d / balance
    val vm = Similarity.quantize(vecCol)
    val centered = zip_with(vm,
      array(model.meanMilli.map(lit(_)): _*), (x, m) => x - m)
    def rot(j: Int): Column =
      floor(aggregate(
        zip_with(centered, array(model.basisMicro(j).map(lit(_)): _*),
          (x, w) => x * w),
        lit(0L), (acc: Column, x: Column) => acc + x).cast("double")
        / lit(1e6)).cast("long")
    val order = (0 until d).map(k => (k % dsub) * balance + k / dsub)
    array(order.map(j => rot(j).cast("double") / lit(1000.0)): _*)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic:
    * fixed (p, q) sweep order, the standard stable rotation
    * (Golub & Van Loan §8.4), IEEE sqrt only. Returns (eigenvalues,
    * eigenvector matrix with vectors in COLUMNS).
    */
  private[graft] def jacobi(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, p, q, c, s)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, c: Double, s: Double): Unit = {
    val d = a.length
    var k = 0
    while (k < d) {
      val akp = a(k)(p); val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < d) {
      val apk = a(p)(k); val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < d) {
      val vkp = v(k)(p); val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }
}
