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

  test("ivWald: LATE = ITT_y / ITT_x, weak instrument yields null") {
    // z=1: x mean 0.8, y mean 12; z=0: x mean 0.2, y mean 9
    // -> itt_x 0.6, itt_y 3, late 5
    val df = Seq(
      (true, 1.0, 13.0), (true, 0.6, 11.0),
      (false, 0.0, 8.0), (false, 0.4, 10.0))
      .toDF("z", "x", "y")
    val r = Causal.ivWald(df, col("z"), "x", "y").collect().head
    assert(r.getAs[Double]("itt_y") === 3.0)
    assert(r.getAs[Double]("itt_x") === 0.6)
    assert(r.getAs[Double]("late") === 5.0)
    // instrument with zero grip: same x distribution in both arms
    val weak = Seq((true, 1.0, 13.0), (true, 0.0, 11.0),
      (false, 1.0, 8.0), (false, 0.0, 10.0)).toDF("z", "x", "y")
    val w = Causal.ivWald(weak, col("z"), "x", "y").collect().head
    assert(w.getAs[Double]("itt_x") === 0.0)
    assert(w.isNullAt(w.fieldIndex("late")))
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
