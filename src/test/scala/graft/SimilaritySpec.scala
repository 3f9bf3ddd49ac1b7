package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("bruteForceTopK: k rows per query, no self, ranked by cosine desc") {
    val queries = emb.filter($"vec_id" < 3)
    val out = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    val rows = out.select($"query_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 15)
    assert(!rows.exists(r => r._1 == r._2))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("bruteForceTopK finds an exact duplicate vector as nearest neighbor") {
    val dup = emb.filter($"vec_id" === 0)
      .select(lit(99999L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(dup)
    val top = Similarity.bruteForceTopK(emb.filter($"vec_id" === 0), corpus,
      "vec_id", "embedding", 1)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].head()
    assert(top._1 == 99999L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("lshTopK: recall@10 vs brute force is reasonable") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.2, s"LSH recall too low: $recall") // probe-limited, sanity floor
  }

  test("ivfTopK: recall@10 vs brute force with nprobe=4 of 16 cells") {
    val queries = emb.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("nearDupPairs is symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.nearDupPairs(emb.limit(100), "vec_id", "embedding", 0.3)
      .select($"id_a", $"id_b", $"cosine").as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0.3))
  }
}
