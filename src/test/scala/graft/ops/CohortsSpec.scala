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

  test("cumulativeNewUsers: first-seen day only, cumulative sums") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00")
    val df = Seq(
      (1L, ts(1)), (2L, ts(1)), (1L, ts(2)),   // u1 returns — not new
      (3L, ts(2)), (4L, ts(4)))
      .toDF("user_id", "ts")
    val rows = graft.ops.Cohorts.cumulativeNewUsers(df, "user_id", "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("cum_users"))).toMap
    assert(rows === Map(
      "2024-03-01" -> ((2L, 2L)),
      "2024-03-02" -> ((1L, 3L)),
      "2024-03-04" -> ((1L, 4L))))
  }

  test("sequenceSupport: eventual ordering with gaps, not adjacency") {
    // u1: view(10) click(20) view(30) buy(40); u2: buy(5) view(15);
    // u3: click(7) only.
    def ts(s: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val df = Seq(
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "view", ts(30)),
      (1L, "buy", ts(40)),
      (2L, "buy", ts(5)), (2L, "view", ts(15)),
      (3L, "click", ts(7)))
      .toDF("user_id", "event_type", "ts")
    val out = graft.ops.Cohorts.sequenceSupport(df, "user_id", "event_type", "ts")
      .collect().map(r => (r.getAs[String]("t_first"), r.getAs[String]("t_then"))
        -> (r.getAs[Long]("n_users"), r.getAs[Double]("support"))).toMap
    // view->buy: u1 yes (10 < 40); u2 NO (15 > 5) -> 1 of 3 users
    assert(out(("view", "buy")) === ((1L, 0.333333)))
    // buy->view: u2 (5 < 15); view->click: u1 (10 < 20)
    assert(out(("buy", "view"))._1 === 1L)
    assert(out(("view", "click"))._1 === 1L)
    // click->view: u1 (click 20 < last view 30) -- gap-tolerant order
    assert(out(("click", "view"))._1 === 1L)
    assert(!out.contains(("click", "buy")) || out(("click", "buy"))._1 === 1L)
  }
}
