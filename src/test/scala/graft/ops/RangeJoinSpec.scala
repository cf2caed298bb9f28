package graft.ops

import graft.SparkTestBase

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
}
