package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus — BM25 ranking as a
  * distributed inverted-index program (extension surface; the reference
  * has no retrieval operator, its text search is the P5 LIKE filter,
  * `process_publications_dag.py:171`).
  *
  * Scoring is Okapi BM25 with the standard k1 = 1.2, b = 0.75, written
  * as EXACT integer arithmetic so the result is engine-reproducible:
  * with N docs, total token count T (so avgdl = T/N), per-term document
  * frequency df, in-document frequency tf, and doc length dl, the
  * classic formula
  *
  *   idf·tf_norm = (N - df + ½)/(df + ½) · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))
  *
  * clears to the single rational A/B with
  *
  *   A = (2N - 2df + 1) · 22 · tf · T
  *   B = (2df + 1) · (10·tf·T + 3·T + 9·dl·N)
  *
  * (k1 = 6/5, b = 3/4, both sides scaled by 10·T). A and B are computed
  * as exact BIGINT products, the per-term score as
  * `floor(A/B · 1e6)` — ONE correctly-rounded IEEE division and
  * multiplication, identical on every engine — and per-document scores
  * as the exact integer SUM of those micro-scores (integer addition is
  * associative, so partitioning can never change the result; this is
  * the q76 fixed-point idiom extended to a multi-factor formula).
  *
  * The rank-breaking idf variant (no +1 inside, Robertson original) can
  * go negative for df > N/2 — stopword-heavy query terms then subtract,
  * which is the documented Okapi behavior and exactly mirrored by the
  * oracle.
  *
  * Overflow bounds (BIGINT): A ≤ (2N+1)·22·tf·T and B ≤
  * (2N+1)·(10·tf+3)·T·≈ — at N = 10⁶ docs, T = 10⁸ tokens, tf ≤ 10³
  * both stay under 2⁶³. Past that, swap the products to DECIMAL(38,0).
  *
  * Scale shape: the postings build is ONE shuffle of the token stream
  * on (doc, token); the query side (a few terms per query) broadcasts;
  * df is computed over the postings RESTRICTED to query terms (never
  * the full vocabulary); scoring aggregates on (qid, doc) and the
  * top-k is one ranking window per query.
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * @param corpus  (idCol, textCol) documents; whitespace-tokenized
    * @param queries (qidCol, qtermsCol: array<string>) — terms are
    *                matched as exact tokens; duplicate terms should be
    *                pre-distinct'd by the caller (each occurrence would
    *                score again)
    * @return (qid, doc_id, score_micro, rn) — top `k` docs per query by
    *         (score desc, doc_id asc), score in 1e-6 units
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      qidCol: String, qtermsCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = split(col(textCol), " ")
    val docs = corpus.select(col(idCol).as("doc_id"),
      toks.as("toks"), size(toks).cast("long").as("dl"))

    // one-row global stats, broadcast into the score expression
    val stats = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))

    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))

    val qterms = queries.select(col(qidCol).as("qid"),
      explode(col(qtermsCol)).as("token"))

    // restrict postings to query terms FIRST (broadcast semi join), so
    // df is only ever counted for the handful of queried tokens
    val hit = postings.join(broadcast(qterms.select(col("token")).distinct()),
      Seq("token"), "left_semi")
    val dfreq = hit.groupBy(col("token")).agg(count(lit(1)).as("df"))

    val a = (lit(2L) * col("n") - lit(2L) * col("df") + lit(1L)) *
      lit(22L) * col("tf") * col("t")
    val b = (lit(2L) * col("df") + lit(1L)) *
      (lit(10L) * col("tf") * col("t") + lit(3L) * col("t") +
        lit(9L) * col("dl") * col("n"))
    val termMicro = floor(a.cast("double") / b.cast("double") *
      lit(1000000.0)).cast("long")

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    hit.join(broadcast(dfreq), "token")
      .join(broadcast(qterms), "token")
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(termMicro).as("score_micro"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("score_micro"),
        col("rn").cast("int").as("rn"))
  }
}
