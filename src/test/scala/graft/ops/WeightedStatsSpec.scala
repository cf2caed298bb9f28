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
}
