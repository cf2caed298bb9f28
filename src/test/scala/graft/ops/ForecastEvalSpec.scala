package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ForecastEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def at(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-01-0$day $hour%02d:00:00")

  test("pinballClimatology: interpolated quantile forecasts, hand losses") {
    // train y = {0, 10} at hod 0 -> P10=1, P50=5, P90=9; eval y = 5
    val rows = Seq(("k", at(1, 0), 0.0, true), ("k", at(2, 0), 10.0, true),
      ("k", at(3, 0), 5.0, false))
    val out = ForecastEval.pinballClimatology(
        rows.toDF("k", "t", "v", "tr"), "k", "t", "v", col("tr"),
        Seq(10, 50, 90))
      .collect().map(r => r.getAs[Long]("q_pct") -> r.getAs[Double]("pinball"))
      .toMap
    assert(math.abs(out(10L) - 0.4) < 1e-6) // 0.1·(5−1)
    assert(out(50L) === 0.0)
    assert(math.abs(out(90L) - 0.4) < 1e-6) // (1−0.9)·(9−5)
  }

  test("conformalSeasonalNaive: perfect repetition certifies full coverage") {
    val rows = for (d <- 1 to 2; h <- 0 until 24)
      yield ("k", at(d, h), (h % 7).toDouble + 1.0)
    val r = ForecastEval.conformalSeasonalNaive(rows.toDF("k", "t", "v"),
      "k", "t", "v", 86400L, alphaPct = 90).collect().head
    assert(r.getAs[Long]("n_cal") === 12L)
    assert(r.getAs[Long]("n_eval") === 12L)
    assert(r.getAs[Double]("qhat") === 0.0)
    assert(r.getAs[Double]("coverage") === 1.0)
    assert(r.getAs[Long]("cov_ok") === 1L)
  }
}
