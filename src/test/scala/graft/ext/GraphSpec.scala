package graft.ext

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("symmetric cycle keeps all ranks equal at every iteration") {
    val got = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 5)
    assert(got.size === 3)
    assert(got.values.toSet.size === 1, s"cycle ranks must be equal: $got")
    // mass is conserved up to floor-division loss: 3 * r ≈ Scale
    val r = got.values.head
    assert(r > Graph.Scale / 3 - 10 && r <= Graph.Scale / 3)
  }

  test("star graph matches the hand-computed integer recurrence") {
    // 1 -> 2, 1 -> 3: after one step, 1 holds only the base term and
    // 2/3 split 1's initial rank. Exact 64-bit floor arithmetic:
    val r0 = Graph.Scale / 3                         // 333333333333
    val base = 15L * Graph.Scale / (100L * 3L)       // 50000000000
    val in = 85L * (r0 / 2L) / 100L                  // 141666666666
    val got = ranks(Seq((1L, 2L), (1L, 3L)), 1)
    assert(got(1L) === base)
    assert(got(2L) === base + in)
    assert(got(3L) === base + in)
  }

  test("dangling vertices leak mass but total never exceeds Scale") {
    // 2 and 3 are dangling (no out-edges): their mass is dropped each
    // step in the simple variant; the sum must stay <= Scale.
    val got = ranks(Seq((1L, 2L), (1L, 3L)), 5)
    assert(got.values.sum <= Graph.Scale)
    assert(got.values.forall(_ > 0))
  }

  test("degrees outer-merges source-only and sink-only vertices") {
    val got = Graph.degrees(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((2L, 0L)))
    assert(got(2L) === ((1L, 1L)))
    assert(got(3L) === ((0L, 2L)), "sink-only vertex must appear with out_deg 0")
  }

  test("pageRank rejects a non-positive iteration count") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
  }

  test("triangleStats: hand graph — triangle plus a tail") {
    // 1-2-3 triangle, 3-4 tail. Direction/duplicates/self-loops erased.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (2L, 1L), (4L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getLong(0) === 4)   // vertices
    assert(r.getLong(1) === 4)   // edges (dedup'd, no self-loop)
    assert(r.getLong(2) === 5)   // wedges: C(2,2)+C(2,2)+C(3,2)+C(1,2)
    assert(r.getLong(3) === 1)   // the one triangle
    assert(r.getDouble(4) === 0.6) // 3*1/5
  }

  test("triangleStats: two triangles sharing an edge count exactly twice") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getLong(3) === 2)
  }

  test("triangleStats: triangle-free star has zero triangles, null-safe clustering") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getLong(3) === 0)
    assert(r.getDouble(4) === 0.0)
  }

  test("hits: the big hub out-scores, the popular target out-scores") {
    // 1 points at 2,3,4; 5 points only at 2 -> 1 is the better hub;
    // 2 is the only multiply-cited authority.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 2L))
      .toDF("src", "dst")
    val rows = Graph.hits(edges, iterations = 3)
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("auth_e12"), r.getAs[Long]("hub_e12"))).toMap
    assert(rows(1L)._2 > rows(5L)._2, "bigger hub wins")
    assert(rows(2L)._1 > rows(3L)._1, "cited-by-both authority wins")
    assert(rows(3L)._1 === rows(4L)._1, "symmetric targets tie")
    // sources have no in-edges, sinks have no out-edges
    assert(rows(1L)._1 === 0L && rows(5L)._1 === 0L)
    assert(rows(2L)._2 === 0L && rows(3L)._2 === 0L)
    // L1 mass is conserved up to one floor-division unit per vertex
    val totalAuth = rows.values.map(_._1).sum
    assert(totalAuth <= Graph.Scale &&
      totalAuth >= Graph.Scale - rows.size)
  }

  test("bfsLevels: chain takes shortest path, unreachable stays absent, hops bound") {
    // 1 -> 2 -> 3 -> 4 -> 5, plus shortcut 1 -> 4; 9 isolated.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 9L)).toDF("src", "dst")
    val levels = Graph.bfsLevels(edges, Seq(1L).toDF("v"), maxHops = 2)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("level")).toMap
    assert(levels === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // 5 reached at hop 2 ONLY via the shortcut; without it hop 4
    val far = Graph.bfsLevels(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"),
      Seq(1L).toDF("v"), maxHops = 2)
      .collect().map(_.getAs[Long]("v")).toSet
    assert(!far.contains(5L), "hop bound must cut the frontier")
  }

  test("modularity: perfect split of two disjoint triangles scores Q = 0.5") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val mem = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("v", "community")
    val rows = Graph.modularity(edges, mem).collect()
      .map(r => r.getAs[Long]("community") -> r).toMap
    // per community: e_in/m − (d/2m)² = 3/6 − (6/12)² = 0.25
    rows.values.foreach { r =>
      assert(r.getAs[Long]("e_in") === 3L)
      assert(r.getAs[Long]("d_tot") === 6L)
      assert(r.getAs[Double]("contribution") === 0.25)
    }
    assert(rows.values.map(_.getAs[Double]("contribution")).sum === 0.5)
  }

  test("modularity: splitting a triangle across communities scores worse") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val bad = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("v", "community")
    val q = Graph.modularity(edges, bad).collect()
      .map(_.getAs[Double]("contribution")).sum
    // Q of the single-community partition is 0; a split is negative
    assert(q < 0.0)
  }

  test("kCore: peeling cascades — removing leaves strips the chain") {
    // triangle 1-2-3 plus a pendant path 3-4-5: the 2-core is exactly
    // the triangle (4 dies, then 5's support is gone transitively).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2, rounds = 5)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("core_deg"))
      .toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above max degree empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.kCore(edges, k = 3, rounds = 3).count() === 0L)
  }

  test("bfsLevels: multi-source takes the nearer source") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 3L)).toDF("src", "dst")
    val levels = Graph.bfsLevels(edges, Seq(1L, 7L).toDF("v"), maxHops = 3)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("level")).toMap
    assert(levels(3L) === 1L, "7 -> 3 beats 1 -> 2 -> 3")
  }

  test("hits: a directed 2-cycle is fully symmetric") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rows = Graph.hits(edges, iterations = 4)
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("auth_e12"), r.getAs[Long]("hub_e12"))).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L)._1 === Graph.Scale / 2)
  }
}
