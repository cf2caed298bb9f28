package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class SeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def h(i: Int) = Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00")

  test("acf: alternating series has r(1) = -1 and r(2) = +1") {
    val rows = (0 until 12).map(i => ("k", h(i), if (i % 2 == 0) 1.0 else 2.0))
    val out = SeriesOps.acf(rows.toDF("k", "t", "v"), "k", "t", "v", 2)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("r")).toMap
    assert(out(1L) === -1.0)
    assert(out(2L) === 1.0)
  }

  test("acf: missing hours drop pairs instead of shifting them") {
    // hours 0,1,2,4 — lag-1 pairs are (0,1),(1,2) and (4 pairs with 3: absent)
    val rows = Seq(0, 1, 2, 4).map(i => ("k", h(i), i.toDouble))
    val out = SeriesOps.acf(rows.toDF("k", "t", "v"), "k", "t", "v", 1)
      .collect().head
    assert(out.getAs[Long]("n") === 2L)
  }

  test("crossCorrelation: a pure shift is found at the right lag with r=1") {
    // b(t) = a(t-2); positive lag means a LEADS. Aperiodic values so no
    // other lag aliases to a perfect correlation.
    val pat = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0, 9.0, 6.0, 11.0, 10.0, 12.0)
    val a = (0 until 12).map(i => ("a", h(i), pat(i)))
    val b = (2 until 14).map(i => ("b", h(i), pat(i - 2)))
    val out = SeriesOps.crossCorrelation((a ++ b).toDF("k", "t", "v"),
      "k", "t", "v", "a", "b", 3).collect()
    val best = out.filter(_.getAs[Long]("best") == 1L)
    assert(best.length === 1)
    assert(best.head.getAs[Long]("lag") === 2L)
    assert(best.head.getAs[Double]("r") === 1.0)
  }

  test("cusum: level shift peaks at the change point") {
    // {1,1,5,5}: mu=3, S = -2,-4,-2,0 -> max|S| = 4 at position 2
    val rows = Seq(("k", h(0), 1L, 1.0), ("k", h(1), 2L, 1.0),
      ("k", h(2), 3L, 5.0), ("k", h(3), 4L, 5.0))
    val r = SeriesOps.cusum(rows.toDF("k", "t", "id", "v"),
      "k", "t", "id", "v").collect().head
    assert(r.getAs[Double]("mu") === 3.0)
    assert(r.getAs[Double]("max_s") === 4.0)
    assert(r.getAs[Long]("at_idx") === 2L)
  }

  test("ewmaTruncated: adjust-mode weights renormalize at the head") {
    // α=.3: second point = (v1 + 0.7·v0)/(1 + 0.7)
    val rows = Seq(("k", h(0), 1L, 1.0), ("k", h(1), 2L, 2.0))
    val out = SeriesOps.ewmaTruncated(rows.toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", alphaTenths = 3, terms = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("ewma")).toMap
    assert(out(1L) === 1.0)
    assert(math.abs(out(2L) - (2.0 + 0.7) / 1.7) < 1e-6)
  }

  test("stlLite: linear ramp decomposes into trend with ~zero remainder") {
    val rows = (0 until 9).map(i => ("k", h(i), i.toLong, i.toDouble))
    val out = SeriesOps.stlLite(rows.toDF("k", "t", "id", "v"),
        "k", "t", "id", "v", half = 1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // edges have no full window
    assert(out(0L).isNullAt(out(0L).fieldIndex("trend")))
    assert(out(8L).isNullAt(out(8L).fieldIndex("trend")))
    // interior: trend = value (centered mean of a ramp), detrended = 0,
    // each hour-of-day bin holds one zero -> seasonal = remainder = 0
    (1L to 7L).foreach { i =>
      assert(out(i).getAs[Double]("trend") === i.toDouble)
      assert(out(i).getAs[Double]("seasonal") === 0.0)
      assert(out(i).getAs[Double]("remainder") === 0.0)
    }
  }
}
