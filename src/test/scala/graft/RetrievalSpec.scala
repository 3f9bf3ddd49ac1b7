package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 correctness: the distributed inverted-index program must equal a
  * plain driver-side re-implementation of the integer-exact formula on a
  * corpus small enough to score by hand — same BIGINT products, same
  * single IEEE division, same floor-to-micro, same integer sum.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs distributed queries over columnar data"),
    (2L, "spark queries shuffle data between executors"),
    (3L, "ducks swim over the pond water"),
    (4L, "columnar data formats compress well"),
    (5L, "the pond water reflects the spark of dawn light")
  ).toDF("doc_id", "text")

  private def referenceBm25(
      docs: Seq[(Long, String)], queries: Seq[(Long, Seq[String])],
      k: Int): Set[(Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val t = toks.values.map(_.size.toLong).sum
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, os) => w -> os.size.toLong } }
    val out = for {
      (qid, terms) <- queries
      scored = toks.keys.toSeq.flatMap { d =>
        val s = terms.flatMap { term =>
          tf(d).get(term).map { f =>
            val df = tf.values.count(_.contains(term)).toLong
            val dl = toks(d).size.toLong
            val a = (2L * n - 2L * df + 1L) * 22L * f * t
            val b = (2L * df + 1L) *
              (10L * f * t + 3L * t + 9L * dl * n)
            math.floor(a.toDouble / b.toDouble * 1000000.0).toLong
          }
        }
        if (s.isEmpty) None else Some(d -> s.sum)
      }
      ((d, sc), i) <- scored.sortBy { case (d, sc) => (-sc, d) }.take(k).zipWithIndex
    } yield (qid, d, sc, i + 1)
    out.toSet
  }

  test("bm25TopK equals the driver-side integer-exact reference") {
    val queries = Seq(
      (100L, Seq("spark", "data")),
      (200L, Seq("pond", "water", "columnar")),
      (300L, Seq("the")) // df > N/2: negative idf is the documented Okapi behavior
    )
    val qdf = queries.toDF("qid", "qterms")
    val got = Retrieval.bm25TopK(corpus, qdf, "doc_id", "text",
        "qid", "qterms", k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    val want = referenceBm25(
      corpus.as[(Long, String)].collect().toSeq, queries, k = 3)
    assert(got == want)
    assert(got.nonEmpty)
    // sanity on the planted structure: doc 1 and 2 both match "spark
    // data"-ish terms; a query term absent everywhere scores nothing
    val qAbsent = Seq((9L, Seq("zzz"))).toDF("qid", "qterms")
    assert(Retrieval.bm25TopK(corpus, qAbsent, "doc_id", "text",
      "qid", "qterms").count() == 0)
  }

  test("score is invariant under repartitioning (integer micro-sum is associative)") {
    val queries = Seq((1L, Seq("spark", "data", "the", "water"))).toDF("qid", "qterms")
    val base = Retrieval.bm25TopK(corpus, queries, "doc_id", "text",
        "qid", "qterms").as[(Long, Long, Long, Int)].collect().toSet
    val shuffled = Retrieval.bm25TopK(corpus.repartition(7), queries,
        "doc_id", "text", "qid", "qterms")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(base == shuffled)
  }
}
