package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DuckDB mirrors for the similarity/ANN queries, generated from the SAME
  * plane matrices and trained centroids the Spark operators use — the
  * q51/q53 technique (render the algorithm's literals into SQL) applied to
  * embeddings. All routing arithmetic is exact-integer on both sides
  * (milli-quantized vectors × micro-quantized planes / milli centroids:
  * terms < 2^40, 64-dim sums < 2^46, exact even if an engine computes the
  * list dot in doubles), so candidate sets, cell assignments and rankings
  * match bit-for-bit.
  *
  * These mirrors are generated AT VERIFY TIME (they need the embedding dim
  * and, for IVF, the deterministically-trained centroids), via
  * [[SparkEntry.oracleSqlDynamic]].
  */
object SimilarityOracle {

  private def longList(a: Array[Long]): String = a.mkString("[", ", ", "]")

  /** Milli-quantized embedding, the SQL twin of [[Similarity.quantize]]. */
  private val vMilli =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  private def dimOf(spark: SparkSession, dir: String): Int =
    Tables(spark, dir, "embeddings")
      .select(size(col("embedding"))).limit(1).collect()(0).getInt(0)

  /** Integer sign-projection bucket id — twin of [[Similarity.lshBucket]]. */
  private def bucketExpr(planes: Array[Array[Long]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(vm, ${longList(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  private def bandedCte(tables: Seq[(Int, Array[Array[Long]])]): String =
    tables.map { case (t, planes) =>
      s"  SELECT vec_id, $t AS tbl, ${bucketExpr(planes)} AS bucket FROM e"
    }.mkString("\nUNION ALL\n")

  /** Mirror of q56: multi-table LSH bucket join, distinct candidate pairs,
    * exact quantized-cosine rerank to top-k.
    */
  def lshTopKSql(spark: SparkSession, dir: String, k: Int = 10,
      nPlanes: Int = 5, nTables: Int = 8, seed: Long = 42L,
      multiProbe: Boolean = false): String = {
    val tables = Similarity.lshTables(dimOf(spark, dir), nPlanes, nTables, seed)
    // multi-probe: the query side also visits every Hamming-1 bucket
    // (j = 0 keeps the original; j >= 1 flips plane j-1)
    val qSide =
      if (!multiProbe) "SELECT vec_id, tbl, bucket FROM b WHERE vec_id % 25 = 0"
      else s"""SELECT q.vec_id, q.tbl,
         |    CASE WHEN j.j = 0 THEN q.bucket
         |         ELSE CAST(xor(q.bucket, CAST(1 AS BIGINT) << (j.j - 1)) AS BIGINT)
         |    END AS bucket
         |  FROM b q CROSS JOIN (SELECT unnest(range(${nPlanes + 1})) AS j) j
         |  WHERE q.vec_id % 25 = 0""".stripMargin
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |b AS (
       |${bandedCte(tables)}),
       |qp AS ($qSide),
       |cand AS (SELECT DISTINCT qp.vec_id AS query_id, c.vec_id AS neighbor_id
       |         FROM qp JOIN b c ON qp.tbl = c.tbl AND qp.bucket = c.bucket
       |         WHERE qp.vec_id <> c.vec_id),
       |scored AS (SELECT query_id, neighbor_id,
       |    list_dot_product(qe.vm, ce.vm) /
       |      (sqrt(list_dot_product(qe.vm, qe.vm)) * sqrt(list_dot_product(ce.vm, ce.vm))) AS cosine
       |  FROM cand JOIN e qe ON qe.vec_id = cand.query_id
       |            JOIN e ce ON ce.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored) r
       |WHERE rank <= $k""".stripMargin
  }

  /** Mirror of q57: trains the integer k-means HERE (deterministic — long
    * sums are partition-order independent, init is the nlist lowest ids),
    * renders the centroids as literals, then replays cell assignment
    * (crn = 1), query probing (crn ≤ nprobe) and the exact rerank.
    */
  def ivfTopKSql(spark: SparkSession, dir: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3,
      trainWhere: Option[String] = None,
      queryWhere: String = "vec_id % 25 = 0",
      corpusWhere: Option[String] = None): String = {
    // trainWhere restricts the TRAINING corpus only (the incremental-add
    // case: centroids from the original corpus, search over everything —
    // appended vectors assign by the same crn = 1 rule the CTE replays);
    // corpusWhere restricts the SEARCHED corpus (the gated-ingest case:
    // only admitted vectors ever entered the store) — it may reference
    // the quantized `e(vec_id, vm)` CTE for vector predicates
    val trainDf = trainWhere.foldLeft(
      Tables(spark, dir, "embeddings"))((d, w) => d.where(w))
    val cents = Similarity.trainCentroids(
      trainDf, "vec_id", "embedding", nlist, iters)
    val sl = cents.map(c => s"list_dot_product(vm, ${longList(c)})")
      .mkString("[\n    ", ",\n    ", "]")
    val cw = corpusWhere.fold("")(w => s" AND ($w)")
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |sc AS (SELECT vec_id, vm, $sl AS sl FROM e),
       |cells AS (SELECT vec_id, vm, CAST(t.cell AS INT) AS cell,
       |            sl[CAST(t.cell AS INT) + 1] AS s
       |          FROM sc CROSS JOIN (SELECT unnest(range(${cents.length})) AS cell) t),
       |ranked AS (SELECT vec_id, vm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS crn
       |  FROM cells),
       |corpus AS (SELECT vec_id AS neighbor_id, vm AS cv, cell FROM ranked WHERE crn = 1$cw),
       |queries AS (SELECT vec_id AS query_id, vm AS qv, cell FROM ranked
       |            WHERE crn <= $nprobe AND ($queryWhere)),
       |scored AS (SELECT query_id, neighbor_id,
       |    list_dot_product(qv, cv) /
       |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
       |  FROM corpus JOIN queries USING (cell)
       |  WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored) r
       |WHERE rank <= $k""".stripMargin
  }

  /** Mirror of q116: IVF-PQ. Trains the SAME coarse centroids and
    * per-subspace codebooks the Spark operator trains (both integer-
    * deterministic), renders them as literals, then replays coarse
    * routing (crn), per-subspace L2 encoding (first-min ties, exactly
    * `Similarity.nearestSubCell`), and the ADC rerank. Every score is
    * an exact integer ≪ 2^53, so DuckDB's double `list_dot_product`
    * arithmetic is exact and the BIGINT cast is lossless.
    */
  def ivfPqTopKSql(spark: SparkSession, dir: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, nSub: Int = 8, ksub: Int = 16,
      iters: Int = 3, trainWhere: Option[String] = None,
      refineShortlist: Option[Int] = None,
      corpusWhere: Option[String] = None,
      trainDf: Option[org.apache.spark.sql.DataFrame] = None,
      srcSql: Option[String] = None,
      queryWhere: String = "vec_id % 25 = 0"): String = {
    // trainWhere restricts the TRAINING corpus only (the stored-index
    // append case, q119: quantizers trained on the original corpus,
    // search over everything — appended vectors route and encode by the
    // same argmax/first-min rules the CTEs replay). trainDf/srcSql
    // override corpus DERIVATION entirely (q245's retrain-on-a-shifted-
    // mixture: the Scala side trains on the unioned relation, the SQL
    // side reads the same union as a subquery).
    val emb = trainDf.getOrElse(trainWhere.foldLeft(
      Tables(spark, dir, "embeddings"))((d, w) => d.where(w)))
    val coarse = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist, iters)
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", nSub, ksub, iters)
    val dsub = books.head.head.length
    def bookLit(m: Int): String =
      books(m).map(longList).mkString("[", ", ", "]")
    def slc(m: Int, v: String): String = s"$v[${m * dsub + 1}:${(m + 1) * dsub}]"
    val sl = coarse.map(c => s"list_dot_product(vm, ${longList(c)})")
      .mkString("[\n    ", ",\n    ", "]")
    // code_m: scores = |c|² − 2·v_m·c per codebook entry; first min wins
    val codeCols = (0 until nSub).map { m =>
      s"""    CAST(list_position(
         |      list_transform(${bookLit(m)},
         |        c -> list_dot_product(c, c) - 2*list_dot_product(${slc(m, "cv")}, c)),
         |      list_min(list_transform(${bookLit(m)},
         |        c -> list_dot_product(c, c) - 2*list_dot_product(${slc(m, "cv")}, c)))) - 1
         |      AS INT) AS code_$m""".stripMargin
    }.mkString(",\n")
    // selected sub-centroid per subspace, then the exact ADC sum
    val selCols = (0 until nSub).map { m =>
      s"    (${bookLit(m)})[code_$m + 1] AS sel_$m"
    }.mkString(",\n")
    val adc = (0 until nSub).map { m =>
      s"""(list_dot_product(${slc(m, "qv")}, ${slc(m, "qv")})
         |     + list_dot_product(sel_$m, sel_$m)
         |     - 2*list_dot_product(${slc(m, "qv")}, sel_$m))""".stripMargin
    }.mkString("\n   + ")
    // the final SELECT: raw ADC ranking, or (refine) an exact
    // quantized-cosine re-rank of each query's top-`shortlist` ADC
    // candidates — mirroring Similarity.pqSearchRefined one-to-one
    val finalSelect = refineShortlist match {
      case None =>
        s"""SELECT query_id, neighbor_id, adc_dist2, CAST(rank AS INT) AS rank FROM (
           |  SELECT query_id, neighbor_id, adc_dist2,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc_dist2 ASC, neighbor_id ASC) AS rank
           |  FROM scored) r
           |WHERE rank <= $k""".stripMargin
      case Some(shortlist) =>
        s""", short AS (SELECT query_id, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc_dist2 ASC, neighbor_id ASC) AS srank
           |  FROM scored) s WHERE srank <= $shortlist),
           |rescored AS (SELECT s.query_id, s.neighbor_id,
           |    list_dot_product(q.vm, n.vm) /
           |      (sqrt(list_dot_product(q.vm, q.vm)) *
           |       sqrt(list_dot_product(n.vm, n.vm))) AS cosine
           |  FROM short s
           |  JOIN e q ON q.vec_id = s.query_id
           |  JOIN e n ON n.vec_id = s.neighbor_id)
           |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
           |  SELECT query_id, neighbor_id, cosine,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, neighbor_id ASC) AS rank
           |  FROM rescored) r
           |WHERE rank <= $k""".stripMargin
    }
    val src = srcSql.fold("embeddings")(q => s"($q) src")
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM $src),
       |sc AS (SELECT vec_id, vm, $sl AS sl FROM e),
       |cells AS (SELECT vec_id, vm, CAST(t.cell AS INT) AS cell,
       |            sl[CAST(t.cell AS INT) + 1] AS s
       |          FROM sc CROSS JOIN (SELECT unnest(range(${coarse.length})) AS cell) t),
       |ranked AS (SELECT vec_id, vm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS crn
       |  FROM cells),
       |corpus AS (SELECT vec_id AS neighbor_id, vm AS cv, cell FROM ranked
       |           WHERE crn = 1${corpusWhere.fold("")(w => s" AND ($w)")}),
       |enc AS (SELECT neighbor_id, cell,
       |$codeCols
       |  FROM corpus),
       |sels AS (SELECT neighbor_id, cell,
       |$selCols
       |  FROM enc),
       |queries AS (SELECT vec_id AS query_id, vm AS qv, cell FROM ranked
       |            WHERE crn <= $nprobe AND ($queryWhere)),
       |scored AS (SELECT query_id, neighbor_id,
       |    CAST($adc AS BIGINT) AS adc_dist2
       |  FROM sels JOIN queries USING (cell)
       |  WHERE query_id <> neighbor_id)
       |$finalSelect""".stripMargin
  }

  /** Mirror of q223: IVF-SQ8. Trains the SAME coarse centroids and
    * per-dimension (min, span) bounds the Spark operator trains (both
    * integer-deterministic), renders them as literals, replays coarse
    * routing, the per-dimension linear encode (`//` where the Spark
    * side's double floor is provably identical), the 255-scaled
    * reconstruction, and the exact integer L2 rerank — every term
    * ≪ 2⁵³, so double list arithmetic is exact.
    */
  def ivfSq8TopKSql(spark: SparkSession, dir: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): String = {
    val emb = Tables(spark, dir, "embeddings")
    val coarse = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist, iters)
    val (mn, span) = Similarity.trainSq8Bounds(emb, "vec_id", "embedding")
    val dim = mn.length
    val mnl = longList(mn); val spl = longList(span)
    val sl = coarse.map(c => s"list_dot_product(vm, ${longList(c)})")
      .mkString("[\n    ", ",\n    ", "]")
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |sc AS (SELECT vec_id, vm, $sl AS sl FROM e),
       |cells AS (SELECT vec_id, vm, CAST(t.cell AS INT) AS cell,
       |            sl[CAST(t.cell AS INT) + 1] AS s
       |          FROM sc CROSS JOIN (SELECT unnest(range(${coarse.length})) AS cell) t),
       |ranked AS (SELECT vec_id, vm, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS crn
       |  FROM cells),
       |corpus AS (SELECT vec_id AS neighbor_id, vm AS cv, cell FROM ranked
       |           WHERE crn = 1),
       |enc AS (SELECT neighbor_id, cell,
       |    [CASE WHEN ($spl)[i] > 0
       |          THEN ((cv[i] - ($mnl)[i]) * 255) // ($spl)[i]
       |          ELSE 0 END
       |     FOR i IN range(1, $dim + 1)] AS codes
       |  FROM corpus),
       |queries AS (SELECT vec_id AS query_id, vm AS qv, cell FROM ranked
       |            WHERE crn <= $nprobe AND vec_id % 25 = 0),
       |scored AS (SELECT query_id, neighbor_id,
       |    CAST(list_dot_product(
       |      [255 * qv[i] - (255 * ($mnl)[i] + codes[i] * ($spl)[i])
       |       FOR i IN range(1, $dim + 1)],
       |      [255 * qv[i] - (255 * ($mnl)[i] + codes[i] * ($spl)[i])
       |       FOR i IN range(1, $dim + 1)]) AS BIGINT) AS sq_dist2
       |  FROM enc JOIN queries USING (cell)
       |  WHERE query_id <> neighbor_id)
       |SELECT query_id, neighbor_id, sq_dist2, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id, sq_dist2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sq_dist2 ASC, neighbor_id ASC) AS rank
       |  FROM scored) r
       |WHERE rank <= $k""".stripMargin
  }

  /** Mirror of q133: banded near-dup over MEDIA FEATURES. The demo
    * payload is the ASCII of `repeat(md5(text), 2)` and the stub decoder
    * derives feature i as float32(digestByte_i / 255) from the payload's
    * md5 DIGEST — so the mirror computes `md5(repeat(md5(text), 2))` hex,
    * extracts each digest byte from its hex pair, and maps it through a
    * 256-entry milli lookup GENERATED by replaying the exact
    * float32-then-double rounding the Spark side performs
    * (`round(double(float32(b/255)) * 1000)`). Banding and the exact
    * quantized-cosine verify then reuse the q67 machinery at dim 8.
    */
  def mediaNearDupSql(threshold: Double, featureDim: Int = 8,
      nPlanes: Int = 6, nTables: Int = 8, seed: Long = 42L): String = {
    val tables = Similarity.lshTables(featureDim, nPlanes, nTables, seed)
    // replays float32(b/255) − 0.5f (the catalog row's mean-centering)
    // then the double·1000 rounding — all in Scala float32 arithmetic,
    // which is bit-identical to Spark's FloatType minus
    val lut = (0 to 255)
      .map(b => math.round((b / 255.0f - 0.5f).toDouble * 1000))
      .mkString("[", ", ", "]")
    def byteExpr(i: Int) =
      s"((strpos('0123456789abcdef', substr(h, ${2 * i + 1}, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substr(h, ${2 * i + 2}, 1)) - 1))"
    val vm = (0 until featureDim)
      .map(i => s"($lut)[${byteExpr(i)} + 1]")
      .mkString("[", ",\n    ", "]")
    val thumb =
      "array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')"
    s"""WITH m AS (SELECT doc_id AS vec_id,
       |             md5(repeat(md5($thumb), 2)) AS h
       |           FROM documents),
       |e AS (SELECT vec_id, $vm AS vm FROM m),
       |b AS (
       |${bandedCte(tables)}),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
       |         FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket
       |                          AND a.vec_id < c.vec_id),
       |scored AS (SELECT id_a, id_b,
       |    list_dot_product(ea.vm, eb.vm) /
       |      (sqrt(list_dot_product(ea.vm, ea.vm)) * sqrt(list_dot_product(eb.vm, eb.vm))) AS cosine
       |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
       |            JOIN e eb ON eb.vec_id = cand.id_b)
       |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= $threshold""".stripMargin
  }

  /** Mirror of q67: banded candidates (id_a < id_b, any table), exact
    * quantized-cosine verify ≥ threshold.
    */
  def bandedNearDupSql(spark: SparkSession, dir: String, threshold: Double,
      nPlanes: Int = 6, nTables: Int = 8, seed: Long = 42L): String = {
    val tables = Similarity.lshTables(dimOf(spark, dir), nPlanes, nTables, seed)
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |b AS (
       |${bandedCte(tables)}),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
       |         FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket
       |                          AND a.vec_id < c.vec_id),
       |scored AS (SELECT id_a, id_b,
       |    list_dot_product(ea.vm, eb.vm) /
       |      (sqrt(list_dot_product(ea.vm, ea.vm)) * sqrt(list_dot_product(eb.vm, eb.vm))) AS cosine
       |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
       |            JOIN e eb ON eb.vec_id = cand.id_b)
       |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= $threshold""".stripMargin
  }

  /** Shared assignment CTE prefix: milli vectors, per-cell integer dot
    * scores, argmax cell by the crn = 1 rule (first max wins — exactly
    * `Similarity.nearestCell` / `array_position(max)`), and the cosine
    * to the assigned centroid from the exact ∑c² literals. Ends with a
    * CTE named `a`: (vec_id, vm, cell, s, csim).
    */
  private def assignCte(cents: Array[Array[Long]]): String = {
    val sl = cents.map(c => s"list_dot_product(vm, ${longList(c)})")
      .mkString("[\n    ", ",\n    ", "]")
    val normSq = longList(cents.map(c => c.map(x => x * x).sum))
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |sc AS (SELECT vec_id, vm, $sl AS sl FROM e),
       |cells AS (SELECT vec_id, vm, CAST(t.cell AS INT) AS cell,
       |            sl[CAST(t.cell AS INT) + 1] AS s
       |          FROM sc CROSS JOIN (SELECT unnest(range(${cents.length})) AS cell) t),
       |a AS (SELECT vec_id, vm, cell, s,
       |        s / (sqrt(list_dot_product(vm, vm)) *
       |             sqrt(CAST(($normSq)[cell + 1] AS DOUBLE))) AS csim
       |      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |              ORDER BY s DESC, cell ASC) AS crn FROM cells)
       |      WHERE crn = 1)""".stripMargin
  }

  /** Mirror of q153 (SemDeDup): replays the trained centroids, the
    * argmax assignment with centroid cosine, the within-cell pair
    * comparisons, and the lower-centroid-cosine-survives domination
    * rule. Every dot is exact-integer; csim/cosine are one IEEE
    * sqrt/divide each, engine-identical.
    */
  def semDedupSql(spark: SparkSession, dir: String, threshold: Double,
      nlist: Int = 16, iters: Int = 3): String = {
    val cents = Similarity.trainCentroids(
      Tables(spark, dir, "embeddings"), "vec_id", "embedding", nlist, iters)
    s"""${assignCte(cents)},
       |dom AS (SELECT DISTINCT x.vec_id
       |        FROM a x JOIN a y ON x.cell = y.cell
       |          AND x.vec_id <> y.vec_id
       |          AND list_dot_product(x.vm, y.vm) /
       |              (sqrt(list_dot_product(x.vm, x.vm)) *
       |               sqrt(list_dot_product(y.vm, y.vm))) >= $threshold
       |          AND (y.csim < x.csim OR
       |               (y.csim = x.csim AND y.vec_id < x.vec_id)))
       |SELECT a.vec_id, a.cell, a.csim AS centroid_sim,
       |  CASE WHEN dom.vec_id IS NULL THEN 1 ELSE 0 END AS kept
       |FROM a LEFT JOIN dom ON dom.vec_id = a.vec_id""".stripMargin
  }

  /** Mirror of q154: argmax assignment + per-cell md5-ordered
    * row_number capped at `quota` (the md5 micro-uniform is the same
    * `Curation.md5Micro("divs:", id)` hash).
    */
  def diverseSampleSql(spark: SparkSession, dir: String, quota: Int,
      nlist: Int = 16, iters: Int = 3): String = {
    val cents = Similarity.trainCentroids(
      Tables(spark, dir, "embeddings"), "vec_id", "embedding", nlist, iters)
    // DuckDB twin of Curation.md5Micro("divs:", vec_id) — the per-nibble
    // hexToLong rendering SparkEntry's oracles use (DuckDB has no conv)
    val hex = "md5('divs:' || CAST(vec_id AS VARCHAR))"
    val h60 = (0 until 15).map { k =>
      s"(strpos('0123456789abcdef', substr($hex, ${1 + k}, 1)) - 1) * ${1L << (4 * (14 - k))}"
    }.mkString(" + ")
    val micro = s"($h60) % 1000000"
    s"""${assignCte(cents)},
       |r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
       |        ORDER BY $micro ASC, vec_id ASC) AS pos FROM a)
       |SELECT vec_id, cell, CAST(pos AS INT) AS pos FROM r
       |WHERE pos <= $quota""".stripMargin
  }

  /** Mirror of q168: PCA projection. FITS the model HERE (the same
    * deterministic moment pass + driver Jacobi the Spark side runs —
    * [[graft.operators.Pca.fit]]), renders the milli mean and micro
    * basis as literals, and replays the centered integer dot products.
    * Every term < 2⁴² and the 64-term sums < 2⁵³, so DuckDB's double
    * `list_dot_product` is exact and the BIGINT cast lossless.
    */
  def pcaProjectSql(spark: SparkSession, dir: String, r: Int): String = {
    val model = graft.operators.Pca.fit(
      Tables(spark, dir, "embeddings"), "embedding", r)
    val projCols = model.basisMicro.zipWithIndex.map { case (b, j) =>
      s"  CAST(list_dot_product(cv, ${longList(b)}) AS BIGINT) AS p$j"
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, $vMilli AS vm FROM embeddings),
       |c AS (SELECT vec_id,
       |        [vm[i] - (${longList(model.meanMilli)})[i]
       |         FOR i IN range(1, len(vm)+1)] AS cv
       |      FROM e)
       |SELECT vec_id,
       |$projCols
       |FROM c""".stripMargin
  }
}
