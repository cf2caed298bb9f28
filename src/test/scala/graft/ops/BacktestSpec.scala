package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class BacktestSpec extends SparkTestBase {
  import spark.implicits._

  private def at(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-01-0$day $hour%02d:00:00")

  test("seasonalNaive: perfect daily repetition scores zero error") {
    val rows = for (d <- 1 to 2; h <- 0 until 24)
      yield ("k", at(d, h), (h % 5).toDouble + 1.0)
    val r = Backtest.seasonalNaive(rows.toDF("k", "t", "v"),
      "k", "t", "v", 86400L).collect().head
    assert(r.getAs[Long]("n") === 24L)
    assert(r.getAs[Double]("mae") === 0.0)
    assert(r.getAs[Double]("smape") === 0.0)
  }

  test("seasonalNaive: constant level shift gives exact MAE and sMAPE") {
    // day1 = 10, day2 = 11 -> |e|=1, sMAPE = 2/21 per bucket
    val rows = for (d <- 1 to 2; h <- 0 until 24)
      yield ("k", at(d, h), if (d == 1) 10.0 else 11.0)
    val r = Backtest.seasonalNaive(rows.toDF("k", "t", "v"),
      "k", "t", "v", 86400L).collect().head
    assert(r.getAs[Double]("mae") === 1.0)
    assert(math.abs(r.getAs[Double]("smape") - 2.0 / 21.0) < 1e-5)
  }

  test("seasonalNaive: buckets without history are dropped, not zero-filled") {
    // only 6 hours on day 2 have a day-1 counterpart
    val rows = (for (h <- 0 until 6) yield ("k", at(1, h), 1.0)) ++
      (for (h <- 0 until 24) yield ("k", at(2, h), 2.0))
    val r = Backtest.seasonalNaive(rows.toDF("k", "t", "v"),
      "k", "t", "v", 86400L).collect().head
    assert(r.getAs[Long]("n") === 6L)
  }
}
