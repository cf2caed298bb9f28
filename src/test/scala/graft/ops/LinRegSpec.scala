package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins scipy.linregress parity (SURVEY §2.4 A2, §2.11). */
class LinRegSpec extends SparkTestBase {
  import spark.implicits._

  test("exact line gives slope/intercept exactly, r2=1, p~0") {
    val df = (1 to 20).map(i => (i.toDouble, 3.0 * i + 2.0)).toDF("x", "y")
    val full = df.select(LinReg.linregFull($"x", $"y").as("r"))
      .select("r.*").as[LinReg.LinRegResult].head()
    assert(math.abs(full.slope - 3.0) < 1e-12)
    assert(math.abs(full.intercept - 2.0) < 1e-12)
    assert(math.abs(full.r2 - 1.0) < 1e-12)
    assert(full.n === 20)
    assert(full.stderr < 1e-6)
  }

  test("noisy line matches scipy.stats.linregress reference values") {
    // y = 2x + 1 + perturbation; scipy reference computed for this exact set:
    // x = 1..6, y = [3.1, 4.9, 7.2, 9.0, 10.8, 13.3]
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val ys = Seq(3.1, 4.9, 7.2, 9.0, 10.8, 13.3)
    val df = xs.zip(ys).toDF("x", "y")
    val r = df.select(LinReg.linregFull($"x", $"y").as("r"))
      .select("r.*").as[LinReg.LinRegResult].head()
    // by hand: ssxx=17.5, ssxy=35.25 -> slope=35.25/17.5, intercept=1.0
    assert(math.abs(r.slope - 2.0142857142857142) < 1e-9)
    assert(math.abs(r.intercept - 1.0) < 1e-9)
    assert(r.r2 > 0.99 && r.r2 < 1.0)
    assert(r.pValue > 0 && r.pValue < 1e-4)
  }

  test("full aggregator agrees with built-in regr_* on grouped data") {
    val df = (1 to 100).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, i.toDouble, i * (if (g == "a") 2.0 else -1.5) + (i % 7))
    }.toDF("g", "x", "y")
    val builtin = LinReg.regrStats(df, $"y", $"x", Seq($"g"))
      .orderBy("g").collect()
    val full = df.groupBy("g").agg(LinReg.linregFull($"x", $"y").as("r"))
      .orderBy("g").select($"g", $"r.slope", $"r.intercept", $"r.r2", $"r.n")
      .collect()
    builtin.zip(full).foreach { case (b, f) =>
      assert(math.abs(b.getDouble(1) - f.getDouble(1)) < 1e-9) // slope
      assert(math.abs(b.getDouble(2) - f.getDouble(2)) < 1e-9) // intercept
      assert(math.abs(b.getDouble(3) - f.getDouble(3)) < 1e-9) // r2
      assert(b.getLong(4) === f.getLong(4))                    // n
    }
  }

  test("fewer than 2 points yields NaN stats, not a crash") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    val r = df.select(LinReg.linregFull($"x", $"y").as("r"))
      .select("r.*").as[LinReg.LinRegResult].head()
    assert(r.n === 1 && r.slope.isNaN)
  }
}
