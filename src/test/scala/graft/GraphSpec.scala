package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: known-graph values, symmetry, mass bounds,
  * determinism.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 6): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric cycle: every node gets exactly S div N") {
    // 3-cycle both directions: the uniform distribution is stationary,
    // and with floor arithmetic each step reproduces base + d·(S/N)/1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 1L), (3L, 2L), (1L, 3L))
    val r = ranks(edges)
    assert(r.keySet == Set(1L, 2L, 3L))
    // uniform within 1 pico of each other (floor noise only)
    assert(r.values.max - r.values.min <= 3,
      s"cycle ranks must stay uniform, got $r")
    // total mass bounded by the scaled total (floors only lose mass)
    assert(r.values.sum <= Graph.Scale)
    assert(r.values.sum > Graph.Scale * 99 / 100)
  }

  test("star graph: the hub outranks every leaf") {
    // hub 0 ↔ leaves 1..6
    val edges = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ranks(edges)
    val hub = r(0L)
    (1L to 6L).foreach(l => assert(hub > r(l),
      s"hub $hub must outrank leaf ${r(l)}"))
    // leaves are symmetric — identical ranks, not merely close
    assert((1L to 6L).map(r).toSet.size == 1)
  }

  test("multi-edges collapse: duplicating an edge changes nothing") {
    val base = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    assert(ranks(base) == ranks(base ++ base ++ Seq((1L, 2L))))
  }

  test("deterministic across runs and partitionings") {
    val edges = (1L to 40L).flatMap { i =>
      val j = (i * 7) % 40 + 1
      Seq((i, j), (j, i))
    }
    val a = ranks(edges)
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(13),
        "src", "dst", 6)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("dangling nodes evaporate mass but ranks stay well-defined") {
    // 1 → 2 → 3, no back edges: 3 is dangling
    val r = ranks(Seq((1L, 2L), (2L, 3L)))
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r.values.sum < Graph.Scale, "dangling mass must evaporate")
    assert(r(3L) > r(1L), "sink accumulates more than the source")
  }
}
