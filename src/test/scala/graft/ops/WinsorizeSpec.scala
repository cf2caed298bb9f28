package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WinsorizeSpec extends SparkTestBase {

  import spark.implicits._

  test("values clip to the per-key percentile bounds; interior rows untouched") {
    // 101 values 0..100 per key: p[0.01]=1.0, p[0.99]=99.0 exactly.
    val df = (0 to 100).flatMap(i => Seq(("a", i.toDouble), ("b", i * 10.0)))
      .toDF("k", "v")
    val w = Winsorize.winsorize(df, Seq("k"), "v", 0.01, 0.99)
    val a = w.filter($"k" === "a")
    assert(a.agg(min($"v_w"), max($"v_w")).head().toSeq === Seq(1.0, 99.0))
    // interior value passes through unchanged
    assert(a.filter($"v" === 50.0).select("v_w").head().getDouble(0) === 50.0)
    // clipped counts: one row below lo (0), one above hi (100)
    assert(a.filter($"v" < $"lo_bound").count() === 1L)
    assert(a.filter($"v" > $"hi_bound").count() === 1L)
    // keys get their own bounds
    assert(w.filter($"k" === "b").select("hi_bound").head().getDouble(0) === 990.0)
  }

  test("approx (sketch) mode: bounds land on data elements and agree with " +
      "exact mode when quantiles hit order statistics") {
    // 101 values 0..100: ranks for p=0.01/0.99 land exactly on elements
    // 1 and 99, so the t-digest at full accuracy must return the same
    // bounds the exact interpolation does.
    val df = (0 to 100).flatMap(i => Seq(("a", i.toDouble), ("b", i * 10.0)))
      .toDF("k", "v")
    val w = Winsorize.winsorize(df, Seq("k"), "v", 0.01, 0.99, exact = false)
    val a = w.filter($"k" === "a")
    assert(a.agg(min($"v_w"), max($"v_w")).head().toSeq === Seq(1.0, 99.0))
    assert(w.filter($"k" === "b").select("hi_bound").head().getDouble(0) === 990.0)
    // approx bounds are actual elements of the key's data
    val vals = (0 to 100).map(_.toDouble).toSet
    val bounds = a.select("lo_bound", "hi_bound").head()
    assert(vals.contains(bounds.getDouble(0)) && vals.contains(bounds.getDouble(1)))
    // clipping invariant holds in both modes
    assert(a.filter($"v_w" < $"lo_bound" || $"v_w" > $"hi_bound").count() === 0L)
  }

  test("quantile preconditions fail fast") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](Winsorize.winsorize(df, Seq("k"), "v", 0.9, 0.1))
    intercept[IllegalArgumentException](Winsorize.winsorize(df, Seq.empty, "v", 0.1, 0.9))
  }
}
