package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class CohortsSpec extends SparkTestBase {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00")

  test("weeklyRetention: cohorts key on first-seen week") {
    // 2024-01-01 and 01-08 land in different epoch weeks
    val df = Seq(
      (1L, day(1)), (1L, day(8)),   // u1: cohort W, active W and W+1
      (2L, day(2)),                 // u2: cohort W only
      (3L, day(9))                  // u3: cohort W+1
    ).toDF("u", "t")
    val out = Cohorts.weeklyRetention(df, "u", "t")
      .collect()
      .map(r => (r.getAs[Long]("cohort_week") -> r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("rate")))
      .toMap
    val w0 = out.keys.map(_._1).min
    assert(out((w0, 0L)) === ((2L, 2L, 1.0)))
    assert(out((w0, 1L)) === ((1L, 2L, 0.5)))
    assert(out((w0 + 1, 0L)) === ((1L, 1L, 1.0)))
  }

  test("markovTransitions: per-user ordered pairs, row-normalized") {
    val df = Seq(
      (1L, day(1), 1L, "a"), (1L, day(2), 2L, "b"), (1L, day(3), 3L, "a"),
      (2L, day(1), 4L, "a"), (2L, day(2), 5L, "a")
    ).toDF("u", "t", "id", "et")
    val out = Cohorts.markovTransitions(df, "u", "t", "id", "et")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(out(("a", "b")) === ((1L, 0.5)))
    assert(out(("a", "a")) === ((1L, 0.5)))
    assert(out(("b", "a")) === ((1L, 1.0)))
    // no cross-user pair (u1 last -> u2 first)
    assert(out.size === 3)
  }
}
