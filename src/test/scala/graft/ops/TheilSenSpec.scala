package graft.ops

import graft.SparkTestBase

class TheilSenSpec extends SparkTestBase {
  import spark.implicits._

  test("perfect line recovers the exact slope; pair count is C(n,2)") {
    val df = (0 until 10).map(i => ("a", i.toLong, i.toDouble, 3.0 + 2.0 * i))
      .toDF("k", "id", "x", "y")
    val r = TheilSen.slope(df, "k", "id", "x", "y").collect().head
    assert(r.getLong(1) === 10 && r.getLong(2) === 45)
    assert(r.getDouble(3) === 2.0)
  }

  test("29% contamination cannot move the slope off the clean trend") {
    // 7 clean points on y = x, 3 wild outliers.
    val clean = (0 until 7).map(i => ("a", i.toLong, i.toDouble, i.toDouble))
    val dirty = Seq(("a", 7L, 7.0, 500.0), ("a", 8L, 8.0, -300.0),
      ("a", 9L, 9.0, 999.0))
    val r = TheilSen.slope((clean ++ dirty).toDF("k", "id", "x", "y"),
      "k", "id", "x", "y").collect().head
    assert(math.abs(r.getDouble(3) - 1.0) < 0.2,
      s"robust slope moved to ${r.getDouble(3)}")
  }

  test("bounded sample caps pairs; single-point key survives null-slope") {
    val big = (0 until 100).map(i => ("a", i.toLong, i.toDouble, i.toDouble))
    val lone = Seq(("b", 0L, 1.0, 1.0))
    val rows = TheilSen.slope((big ++ lone).toDF("k", "id", "x", "y"),
        "k", "id", "x", "y", maxPoints = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getLong(1) === 10 && rows("a").getLong(2) === 45)
    assert(rows("b").getLong(1) === 1 && rows("b").getLong(2) === 0)
    assert(rows("b").isNullAt(3))
  }

  test("equal-x pairs carry no slope and are excluded") {
    val df = Seq(("a", 1L, 5.0, 1.0), ("a", 2L, 5.0, 9.0), ("a", 3L, 6.0, 2.0))
      .toDF("k", "id", "x", "y")
    val r = TheilSen.slope(df, "k", "id", "x", "y").collect().head
    assert(r.getLong(2) === 2) // only the two (5.0 -> 6.0) pairs
  }
}
