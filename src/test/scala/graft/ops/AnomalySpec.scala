package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("rollingZScore: trailing frame excludes self, warms up, flags the spike") {
    // key a: 4 quiet points then a spike; nPrev = 3.
    val df = Seq(
      ("a", ts(0), 1L, 10.0), ("a", ts(1), 2L, 12.0),
      ("a", ts(2), 3L, 11.0), ("a", ts(3), 4L, 10.0),
      ("a", ts(4), 5L, 100.0),
      ("b", ts(0), 6L, 5.0)
    ).toDF("k", "t", "id", "v")
    val out = Anomaly.rollingZScore(df, "k", "t", "id", "v", nPrev = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    // ids 1..3: fewer than 3 predecessors -> warm-up nulls
    assert(out(1L).isNullAt(4) && out(2L).isNullAt(4) && out(3L).isNullAt(4))
    // id 4: window {10,12,11} -> mean 11, sd 1, z = (10-11)/1 = -1
    assert(out(4L).getDouble(4) === 11.0)
    assert(out(4L).getDouble(5) === -1.0)
    assert(out(4L).getLong(6) === 0L)
    // id 5: window {12,11,10} -> mean 11, sd 1, z = 89 -> anomaly
    assert(out(5L).getDouble(5) === 89.0)
    assert(out(5L).getLong(6) === 1L)
    // key b: single point, never flagged
    assert(out(6L).isNullAt(6))
  }

  test("rollingZScore: zero-variance window yields null z, not Infinity") {
    val df = Seq(
      ("a", ts(0), 1L, 5.0), ("a", ts(1), 2L, 5.0),
      ("a", ts(2), 3L, 5.0), ("a", ts(3), 4L, 9.0)
    ).toDF("k", "t", "id", "v")
    val r4 = Anomaly.rollingZScore(df, "k", "t", "id", "v", nPrev = 3)
      .filter($"id" === 4L).collect().head
    assert(r4.isNullAt(5) && r4.isNullAt(6))
  }

  test("madOutliers: fence from median and MAD; outlier cannot move its own fence") {
    // 9 points near 10 plus one wild point: median ~10, MAD small.
    val vals = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 11.0, 500.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("g", "id", "v")
    val r = Anomaly.madOutliers(df, "g", "v").collect().head
    assert(r.getDouble(1) === 10.25)         // interpolated median
    assert(r.getDouble(2) === 0.5)           // MAD
    assert(r.getLong(3) === 10L)
    assert(r.getLong(4) === 1L)              // only the 500 is outside
  }

  test("climatology profile and anomaly: hour-of-day means, guarded ratio") {
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 06:00:00"), 1L, 10.0),
      ("a", Timestamp.valueOf("2024-01-02 06:30:00"), 2L, 20.0),
      ("a", Timestamp.valueOf("2024-01-01 12:00:00"), 3L, 0.0),
      ("b", Timestamp.valueOf("2024-01-01 06:00:00"), 4L, 7.0)
    ).toDF("k", "t", "id", "v")
    val prof = Climatology.profile(df, "k", "t", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(prof(("a", 6)) === ((2L, 15.0)))
    assert(prof(("a", 12)) === ((1L, 0.0)))
    assert(prof(("b", 6)) === ((1L, 7.0)))
    val an = Climatology.anomaly(df, "k", "t", "id", "v")
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(an(1L).getDouble(5) === -5.0)     // 10 - 15
    assert(an(1L).getDouble(6) === 0.666667) // 10/15 rounded
    assert(an(3L).isNullAt(6))               // 0 baseline -> null ratio
  }
}
