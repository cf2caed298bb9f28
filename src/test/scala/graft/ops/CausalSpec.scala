package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CausalSpec extends SparkTestBase {
  import spark.implicits._

  test("cuped: hand moments — theta, raw and adjusted deltas") {
    // x = {10,12 | 0,2}, y = x + 1 for treated:
    // cov = 28.5, var(x) = 26 -> θ = 114/104; adjusted delta = 11 − 10θ
    val df = Seq((1L, 10.0, 11.0), (2L, 12.0, 13.0),
      (3L, 0.0, 0.0), (4L, 2.0, 2.0)).toDF("u", "x", "y")
    val r = Causal.cuped(df, col("u") <= 2, "y", "x").collect().head
    assert(r.getAs[Long]("n_t") === 2L && r.getAs[Long]("n_c") === 2L)
    assert(math.abs(r.getAs[Double]("theta") - 114.0 / 104.0) < 1e-6)
    assert(r.getAs[Double]("delta_raw") === 11.0)
    assert(math.abs(r.getAs[Double]("delta_cuped") -
      (11.0 - 114.0 / 104.0 * 10.0)) < 2e-6)
    // ρ² = 114²/(104·125)
    assert(math.abs(r.getAs[Double]("var_reduction") - 12996.0 / 13000.0) < 1e-5)
  }

  test("cuped: metric independent of covariate leaves delta unchanged") {
    val df = Seq((1L, 5.0, 3.0), (2L, 7.0, 3.0), (3L, 5.0, 1.0), (4L, 7.0, 1.0))
      .toDF("u", "x", "y")
    val r = Causal.cuped(df, col("u") <= 2, "y", "x").collect().head
    assert(r.getAs[Double]("theta") === 0.0)
    assert(r.getAs[Double]("delta_raw") === 2.0)
    assert(r.getAs[Double]("delta_cuped") === 2.0)
  }

  test("stratifiedEffect: per-stratum effects and share weights") {
    val df = Seq(
      ("s1", 1L, 2.0), ("s1", 2L, 4.0), ("s1", 3L, 1.0), ("s1", 4L, 3.0),
      ("s2", 5L, 10.0), ("s2", 6L, 6.0)
    ).toDF("s", "u", "y")
    val out = Causal.stratifiedEffect(df, "s", col("u") % 2 === 1, "y")
      .collect().map(r => r.getString(0) -> r).toMap
    // s1: treated {2,1} mean 1.5, control {4,3} mean 3.5
    assert(out("s1").getAs[Double]("effect") === -2.0)
    assert(math.abs(out("s1").getAs[Double]("weight") - 4.0 / 6.0) < 1e-6)
    assert(out("s2").getAs[Double]("effect") === 4.0)
    assert(math.abs(out("s2").getAs[Double]("weight") - 2.0 / 6.0) < 1e-6)
  }

  test("diffInDiff: hand four-cell case") {
    // treated: pre mean 10, post mean 15 (+5); control: 20 -> 22 (+2)
    // -> did = +3; pre_gap = -10.
    val rows = Seq(
      (true, false, 8.0), (true, false, 12.0),
      (true, true, 14.0), (true, true, 16.0),
      (false, false, 19.0), (false, false, 21.0),
      (false, true, 22.0), (false, true, 22.0))
    val r = Causal.diffInDiff(rows.toDF("t", "p", "y"),
      col("t"), col("p"), "y").collect().head
    assert(r.getAs[Long]("n_t_pre") === 2 && r.getAs[Long]("n_c_post") === 2)
    assert(r.getAs[Double]("pre_gap") === -10.0)
    assert(r.getAs[Double]("post_gap") === -7.0)
    assert(r.getAs[Double]("did") === 3.0)
  }

  test("diffInDiff: identical trends cancel to zero effect") {
    val rows = Seq(
      (true, false, 1.0), (true, true, 4.0),
      (false, false, 7.0), (false, true, 10.0))
    val r = Causal.diffInDiff(rows.toDF("t", "p", "y"),
      col("t"), col("p"), "y").collect().head
    assert(r.getAs[Double]("did") === 0.0)
  }
}
