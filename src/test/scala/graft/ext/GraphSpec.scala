package graft.ext

import org.scalactic.Tolerance._

import graft.SparkSpec

/** PageRank: hand-checkable fixpoints and mass conservation. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric two-node graph settles at equal ranks summing to 1") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 5).as[(Long, Double)]
      .collect().toMap
    assert(got(1L) === 0.5 +- 1e-9)
    assert(got(2L) === 0.5 +- 1e-9)
  }

  test("star graph: hub outranks leaves, local mirror reproduced exactly") {
    // undirected star: hub 0 <-> leaves 1..4
    val e = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val got = Graph.pageRank(e, iters = 12).as[(Long, Double)]
      .collect().toMap
    assert(got(0L) > got(1L) * 2)
    assert((1L to 4L).map(got).distinct.size === 1) // leaves symmetric
    assert(got.values.sum === 1.0 +- 1e-6) // no dangling leak
    // exact mirror of the rounded synchronous iteration (the
    // bipartite mode decays as 0.85^k, so the analytic fixpoint is
    // NOT reached in finitely many steps — the iterate itself is the
    // contract): hub' = t + d·4·leaf/1, leaf' = t + d·hub/4
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (hub, leaf) = (0.2, 0.2)
    for (_ <- 1 to 12) {
      val (h2, l2) = (r8(0.03 + 0.85 * (4 * (leaf / 1))),
        r8(0.03 + 0.85 * (hub / 4)))
      hub = h2; leaf = l2
    }
    assert(got(0L) === hub)
    assert(got(1L) === leaf)
  }

  test("ranks are invariant to edge-list partitioning") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val a = Graph.pageRank(edges.repartition(1), iters = 4)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.repartition(7), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(a === b) // exact: per-iteration rounding pins the fold
  }

  test("bfs: path graph distances, cap, and early exit") {
    // path 1-2-3-4-5 (undirected)
    val e = (1L to 4L).flatMap(i => Seq((i, i + 1), (i + 1, i))).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d3 = Graph.bfsDistances(e, seeds, 3).as[(Long, Int)].collect().toMap
    assert(d3 === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 5 beyond cap
    // cap above diameter: early exit, full distances
    val d9 = Graph.bfsDistances(e, seeds, 9).as[(Long, Int)].collect().toMap
    assert(d9 === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("bfs: multi-source takes the nearest seed; reconvergence keeps min") {
    // cycle 1-2-3-4-5-6-1
    val ring = (1L to 6L).map(i => (i, i % 6 + 1))
    val e = (ring ++ ring.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val d = Graph.bfsDistances(e, seeds, 5).as[(Long, Int)].collect().toMap
    assert(d === Map(1L -> 0, 4L -> 0, 2L -> 1, 6L -> 1, 3L -> 1, 5L -> 1))
  }

  test("bfs: maxHops 0 returns just the seeds") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val d = Graph.bfsDistances(e, Seq(1L).toDF("node"), 0)
      .as[(Long, Int)].collect().toMap
    assert(d === Map(1L -> 0))
  }
}
