package graft.ops

import graft.SparkTestBase

class WeightedStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def wmed(rows: Seq[(String, Double, Long)]) =
    WeightedStats.weightedMedian(rows.toDF("k", "v", "w"), "k", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("weight mass moves the median where counts would not") {
    // values 1..4 with weight 1 each, plus value 10 with weight 6:
    // total 10, half 5 -> cum: 1,2,3,4,10 -> first 2*cum>=10 at v=10.
    val m = wmed(Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L),
      ("a", 4.0, 1L), ("a", 10.0, 6L)))
    assert(m("a") === ((10L, 10.0)))
    // unweighted (all 1): median of {1,2,3,4,10} -> 2*cum>=5 at v=3
    val u = wmed(Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L),
      ("a", 4.0, 1L), ("a", 10.0, 1L)))
    assert(u("a")._2 === 3.0)
  }

  test("exact-half boundary takes the lower value (lower weighted median)") {
    // weights 1,1 on values 5,9: cum(5)=1, 2*1>=2 -> v=5.
    val m = wmed(Seq(("a", 5.0, 1L), ("a", 9.0, 1L)))
    assert(m("a") === ((2L, 5.0)))
  }

  test("duplicate values pool their weight under the range frame") {
    // v=2 twice (weight 1+1), v=1 weight 1: cum(1)=1 <.5*3; cum(2)=3 -> v=2
    val m = wmed(Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 2.0, 1L)))
    assert(m("a") === ((3L, 2.0)))
  }

  test("keys are independent") {
    val m = wmed(Seq(("a", 1.0, 9L), ("a", 100.0, 1L), ("b", 7.0, 1L)))
    assert(m("a")._2 === 1.0 && m("b")._2 === 7.0)
  }

  test("huberMean: one reweight shrinks an outlier's pull by two thirds") {
    // inliers at 10 ± 1, one outlier at 1000 drags the raw mean to
    // 208. From that corrupted start EVERY residual exceeds k, so one
    // reweight recovers partially (to ~68), not fully — the honest
    // one-step behavior; full PAV-style robustness is the weighted
    // median's job.
    val df = Seq(("a", 9.0), ("a", 10.0), ("a", 11.0), ("a", 10.0),
      ("a", 1000.0)).toDF("k", "v")
    val r = WeightedStats.huberMean(df, "k", "v", k = 5.0).collect().head
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("mean_raw") === 208.0)
    val hm = r.getAs[Double]("huber_mean")
    assert(hm > 10.0 && hm < 208.0 / 2.0,
      s"one reweight must at least halve the outlier's pull: $hm")
    // clean data: huber == mean exactly (all weights 1)
    val clean = Seq(("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("k", "v")
    val c = WeightedStats.huberMean(clean, "k", "v", k = 5.0).collect().head
    assert(c.getAs[Double]("huber_mean") === c.getAs[Double]("mean_raw"))
  }
}
