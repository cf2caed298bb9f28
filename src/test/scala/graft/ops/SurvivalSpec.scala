package graft.ops

import graft.SparkTestBase

class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier: textbook mixed events and censorings") {
    // durations: 1 event, 2 censored, 3 event + 3 censored, 4 event, 5 censored
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, false),
      (4L, true), (5L, false)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.keySet === Set(1L, 3L, 4L))
    assert(out(1L).getAs[Long]("n_risk") === 6L)
    assert(math.abs(out(1L).getAs[Double]("s") - 5.0 / 6.0) < 1e-5)
    assert(out(3L).getAs[Long]("n_risk") === 4L)
    assert(out(3L).getAs[Long]("c") === 1L)
    // S(3) = 5/6 · 3/4
    assert(math.abs(out(3L).getAs[Double]("s") - 0.625) < 1e-5)
    assert(out(4L).getAs[Long]("n_risk") === 2L)
    assert(math.abs(out(4L).getAs[Double]("s") - 0.3125) < 1e-5)
  }

  test("kaplanMeier: total extinction ends at exactly 0") {
    val df = Seq((1L, true), (1L, true)).toDF("dur", "ev")
    val out = Survival.kaplanMeier(df, "dur", "ev").collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("s") === 0.0)
    assert(out.head.getAs[Long]("d") === 2L)
  }

  test("kaplanMeier: censored-only input yields no rows (no event times)") {
    val df = Seq((1L, false), (2L, false)).toDF("dur", "ev")
    assert(Survival.kaplanMeier(df, "dur", "ev").count() === 0L)
  }
}
