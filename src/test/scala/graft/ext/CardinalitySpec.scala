package graft.ext

import graft.SparkTestBase

class CardinalitySpec extends SparkTestBase {
  import spark.implicits._

  // 60 rows, skewed: "a" x30, "b" x15, c0..c14 x1 each -> 17 distinct.
  private lazy val items =
    (Seq.fill(30)("a") ++ Seq.fill(15)("b") ++ (0 until 15).map(i => s"c$i"))
      .zipWithIndex.map { case (w, i) => (i.toLong, if (i % 2 == 0) "g1" else "g2", w) }
      .toDF("id", "g", "w")

  test("hllDistinctContract: exact distinct per group, estimate inside tolerance") {
    val rows = Cardinality.hllDistinctContract(items, "g", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactByG = items.select("g", "w").distinct().groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("g1", "g2"))
    rows.foreach { case (g, (n, ok)) =>
      assert(n === exactByG(g))
      assert(ok === 1L, s"HLL estimate out of tolerance for group $g")
    }
  }

  test("hllUnionContract: merged shards agree with the direct sketch") {
    val r = Cardinality.hllUnionContract(items, "w", "id").collect().head
    assert(r.getLong(0) === 17)
    assert(r.getLong(1) === 1L, "union-of-sketches must agree with direct sketch")
    assert(r.getLong(2) === 1L)
  }

  test("sparse regime: union estimate is EXACTLY the direct estimate") {
    import org.apache.spark.sql.functions._
    // Below promotion thresholds the union result IS the direct summary
    // (see hllUnionContract doc for the measured dense-mode divergence).
    val parts = items.groupBy((col("id") % 4).as("s"))
      .agg(hll_sketch_agg(col("w"), lit(12)).as("sk"))
    val u = parts
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head.getLong(0)
    val d = items.agg(hll_sketch_estimate(hll_sketch_agg(col("w"), lit(12))))
      .head.getLong(0)
    assert(u === d && u === 17)
  }

  test("cmsBoundsContract: top-k exact counts with CMS one-sided bounds") {
    val got = Cardinality.cmsBoundsContract(items, "w", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // count desc, item asc: a(30), b(15), then the lexicographically
    // first singleton c0.
    assert(got.map(_._1).toSeq === Seq("a", "b", "c0"))
    assert(got.map(_._2).toSeq === Seq(30L, 15L, 1L))
    got.foreach { case (w, _, lo, hi) =>
      assert(lo === 1L, s"CMS undercounted $w")
      assert(hi === 1L, s"CMS overcount bound violated for $w")
    }
  }
}
