package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — brute-force cosine as the exact baseline, plus two
  * scale paths: random-hyperplane LSH bucketing and IVF (k-means coarse
  * quantizer). Builder-prompt extension surface.
  *
  * Scale design: the corpus is never collected; queries (the small side)
  * broadcast into a cross/bucket join; dot products are codegen'd
  * `zip_with`/`aggregate` expressions, no UDFs. The quantized variants use
  * exact integer arithmetic so results are engine-portable for oracles.
  */
object Similarity {

  /** Dot product of two double-array columns — native codegen expression
    * ([[org.apache.spark.sql.graft.DoubleDot]]); left-to-right
    * accumulation, deterministic.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dot_double(a, b)

  /** Quantize a float embedding to exact integer milliunits — makes every
    * downstream sum/product exact (deterministic across engines).
    * The float is widened to double BEFORE the multiply: `float * 1000`
    * evaluated in float32 rounds differently from an engine computing in
    * double at .5-boundary products (observed at sf0.1), while
    * float→double widening is exact everywhere.
    */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  private def dotLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dot_long(a, b)

  /** Cosine similarity on quantized vectors: integer dot and norms, one
    * final IEEE sqrt+divide (bit-identical in any engine).
    */
  def cosineQuantized(a: Column, b: Column): Column =
    dotLong(a, b) / (sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` and `corpus` both have (idCol, vecCol); self-pairs excluded.
    * The queries side is broadcast (assumed ≪ corpus); ranking is
    * tie-broken on neighbor id for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are computed ONCE per vector before the cross join — inside it
    // they'd be recomputed per pair (O(n·m·d) extra work)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dotLong(col("qv"), col("qv")).cast("double")))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(dotLong(col("cv"), col("cv")).cast("double")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotLong(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All near-duplicate pairs with cosine ≥ threshold (id_a < id_b).
    * Brute-force within — use for modest corpora or LSH-bucketed input.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), quantize(col(vecCol)).as("va"))
      .withColumn("na", sqrt(dotLong(col("va"), col("va")).cast("double")))
    val b = df.select(col(idCol).as("id_b"), quantize(col(vecCol)).as("vb"))
      .withColumn("nb", sqrt(dotLong(col("vb"), col("vb")).cast("double")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotLong(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim`, seeded. */
  private[operators] def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection LSH bucket id (0 .. 2^nPlanes-1) for a vector
    * column: bit i = sign(v · plane_i). Pure expression, no UDF.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toSeq.map(lit(_)): _*)
      when(dot(vec.cast("array<double>"), planeLit) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: hash corpus and queries into
    * sign-projection buckets (`nTables` independent tables to boost
    * recall), search only same-bucket candidates, exact-rerank.
    * The shuffle key is (table, bucket) — at 100 TB the corpus partitions
    * by bucket and each query touches nTables buckets instead of the
    * full corpus.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 5, nTables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val dimRow = queries.select(size(col(vecCol))).limit(1).collect()
    if (dimRow.isEmpty) // no queries → empty result, not a crash
      return queries.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("neighbor_id"),
          lit(0.0).as("cosine"), lit(0).as("rank")).limit(0)
    val dim = dimRow.head.getInt(0)
    val tables = (0 until nTables).map { t =>
      (t, hyperplanes(dim, nPlanes, seed + t))
    }
    def bucketed(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"${id}_v"),
          explode(array(tables.map { case (ti, planes) =>
            struct(lit(ti).as("tbl"), lshBucket(col(vecCol), planes).as("bucket"))
          }: _*)).as("tb"))
        .select(col(id), col(s"${id}_v"), col("tb.tbl"), col("tb.bucket"))
    val qb = bucketed(queries, "query_id")
    val cb = bucketed(corpus, "neighbor_id")
    val candidates = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // dedup multi-table collisions on the id PAIR (array-valued columns
      // would make the dedup shuffle compare whole vectors)
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        quantize(col("query_id_v")).as("qv"), quantize(col("neighbor_id_v")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("qn", sqrt(dotLong(col("qv"), col("qv")).cast("double")))
      .withColumn("cn", sqrt(dotLong(col("cv"), col("cv")).cast("double")))
      .select(col("query_id"), col("neighbor_id"),
        (dotLong(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF coarse quantizer: Lloyd k-means over the corpus (few iterations,
    * centroids live on the driver — nlist vectors, tiny), then search only
    * the `nprobe` nearest centroid cells per query.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 5, seed: Long = 42L): Array[Array[Double]] = {
    val dimRow = corpus.select(size(col(vecCol))).limit(1).collect()
    if (dimRow.isEmpty) return Array.empty
    val dim = dimRow.head.getInt(0)
    var centroids = corpus.select(col(vecCol)).limit(nlist).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (centroids.length < nlist) centroids = centroids ++
      hyperplanes(dim, nlist - centroids.length, seed)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(col(vecCol).cast("array<double>").as("v"))
        .withColumn("cell", nearestCell(col("v"), centroids))
      // per-(cell, dim) mean: scales to any cell size (no per-cell list);
      // the collected result is only nlist × dim values.
      val newCents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      for (r <- newCents)
        centroids(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    centroids
  }

  /** Per-centroid dot scores as ONE array expression — a single literal
    * centroid matrix + nested lambda keeps the codegen tree linear in
    * nlist×dim (a naive reduce-of-structs duplicates the dot expressions
    * quadratically and stalls codegen).
    */
  private def cellScores(vec: Column, centroids: Array[Array[Double]]): Column =
    transform(array(centroids.toSeq.map(c => array(c.toSeq.map(lit(_)): _*)): _*),
      c => dot(vec, c))

  /** Index of the nearest centroid (max dot; first index wins ties). */
  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val s = cellScores(vec, centroids)
    (array_position(s, array_max(s)) - 1).cast("int")
  }

  /** Cell indices argsorted by score desc (index-asc tiebreak). */
  private def cellsByScore(vec: Column, centroids: Array[Array[Double]]): Column = {
    val s = cellScores(vec, centroids)
    val zipped = zip_with(s, sequence(lit(0), lit(centroids.length - 1)),
      (sc, i) => struct(sc.as("s"), i.as("i")))
    transform(
      array_sort(zipped, (a, b) =>
        when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
          .otherwise((a("i") - b("i")).cast("int"))),
      x => x("i").cast("int"))
  }

  /** IVF top-k: assign corpus rows to cells once (this would be the
    * persisted index at scale), probe the nearest `nprobe` cells per query,
    * exact-rerank within.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 3): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, nlist, iters)
    if (centroids.isEmpty) // empty corpus → empty result
      return corpus.sparkSession.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("neighbor_id"),
          lit(0.0).as("cosine"), lit(0).as("rank")).limit(0)
    val cb = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", nearestCell(col("cv"), centroids))
    val qb = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell",
        explode(slice(cellsByScore(col("qv"), centroids), 1, nprobe)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cb.join(broadcast(qb), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
          .as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

}
