package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, "u", 100L), (2L, "u", 600L), (3L, "u", 1200L), (4L, "v", 600L)
  ).toDF("pid", "user", "sec")

  test("containment is inclusive on both bounds; keys separate users; bins don't split matches") {
    val intervals = Seq(
      (10L, "u", 100L, 600L),   // hits 1 (lo boundary) and 2 (hi boundary)
      (11L, "u", 601L, 1300L),  // hits 3 only; crosses a 600s bin edge
      (12L, "v", 0L, 2000L)     // hits 4 only (key-scoped)
    ).toDF("iid", "user", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "sec", intervals, "lo", "hi",
        keys = Seq("user"), binSeconds = 600L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L)))
  }

  test("degenerate wide intervals are dropped by the maxBins cap, not replicated") {
    val intervals = Seq(
      (20L, "u", 0L, 10000000L), // ~16k bins at 600s: over the cap of 4
      (21L, "u", 550L, 650L)     // sane interval still matches
    ).toDF("iid", "user", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "sec", intervals, "lo", "hi",
        keys = Seq("user"), binSeconds = 600L, maxBins = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 21L)))
  }

  test("inverted intervals (hi < lo) match nothing instead of exploding") {
    val intervals = Seq((30L, "u", 700L, 100L)).toDF("iid", "user", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "sec", intervals, "lo", "hi",
      keys = Seq("user"), binSeconds = 600L)
    assert(got.count() === 0)
  }

  test("intervalOverlapJoin equals brute force, each pair exactly once") {
    // spans chosen so several pairs share MULTIPLE bins (bin=100):
    // without the overlap-start-bin dedup they would duplicate.
    val left = Seq((1L, 0L, 250L), (2L, 300L, 720L), (3L, 900L, 910L))
      .toDF("lid", "lo_l", "hi_l")
    val right = Seq((10L, 240L, 400L), (11L, 500L, 1000L), (12L, 50L, 60L))
      .toDF("rid", "lo_r", "hi_r")
    val got = RangeJoin.intervalOverlapJoin(left, "lo_l", "hi_l",
        right, "lo_r", "hi_r", binSeconds = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val brute = left.crossJoin(right)
      .filter(col("lo_l") <= col("hi_r") && col("lo_r") <= col("hi_l"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet === brute)
    assert(got.size === got.toSet.size, "a pair was emitted twice")
    assert(brute === Set((1L, 10L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 11L)))
  }

  test("intervalOverlapJoin: touching endpoints overlap (closed intervals)") {
    val l = Seq((1L, 0L, 100L)).toDF("lid", "lo_l", "hi_l")
    val r = Seq((9L, 100L, 200L)).toDF("rid", "lo_r", "hi_r")
    assert(RangeJoin.intervalOverlapJoin(l, "lo_l", "hi_l",
      r, "lo_r", "hi_r", binSeconds = 50L).count() === 1)
  }

  test("coalesceIntervals: chains merge transitively, gaps split, keys isolate") {
    val df = Seq(
      ("u", 0L, 10L), ("u", 5L, 20L), ("u", 20L, 30L),   // one span 0-30
      ("u", 40L, 50L),                                   // gap -> new span
      ("v", 0L, 100L))
      .toDF("k", "lo", "hi")
    val got = RangeJoin.coalesceIntervals(df, Seq("k"), "lo", "hi")
      .collect().map(r => (r.getString(0), r.getAs[Long]("span_lo"),
        r.getAs[Long]("span_hi"), r.getAs[Long]("n_merged"))).toSet
    assert(got === Set(
      ("u", 0L, 30L, 3L), ("u", 40L, 50L, 1L), ("v", 0L, 100L, 1L)))
  }

  test("coalesceIntervals: containment and inverted intervals") {
    // an interval fully inside another must not split the span when a
    // later interval starts after the CONTAINED one's end
    val df = Seq(
      ("u", 0L, 100L), ("u", 10L, 20L), ("u", 30L, 40L),
      ("u", 200L, 150L))                    // inverted -> dropped
      .toDF("k", "lo", "hi")
    val got = RangeJoin.coalesceIntervals(df, Seq("k"), "lo", "hi")
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("span_hi") === 100L)
    assert(got.head.getAs[Long]("n_merged") === 3L)
  }
}
