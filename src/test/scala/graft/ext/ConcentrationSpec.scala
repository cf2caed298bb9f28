package graft.ext

import graft.SparkTestBase

class ConcentrationSpec extends SparkTestBase {
  import spark.implicits._

  test("giniBySize: equal groups give 0; 1-vs-3 split gives 0.25") {
    val eq = Seq("a", "a", "b", "b").toDF("g")
    val r0 = Concentration.giniBySize(eq, "g").collect().head
    assert(r0.getAs[Double]("gini") === 0.0)
    assert(r0.getAs[Double]("top_share") === 0.5)

    val skew = Seq("a", "b", "b", "b").toDF("g")
    val r1 = Concentration.giniBySize(skew, "g").collect().head
    // sizes (1,3): G = 2(1·1 + 2·3)/(2·4) − 3/2 = 0.25
    assert(r1.getAs[Double]("gini") === 0.25)
    assert(r1.getAs[Double]("top_share") === 0.75)
  }

  test("benford: first digit comes from exact integer extraction") {
    val df = Seq(1.0, 0.5, 23.7, 900.0, 0.0, -4.0).toDF("v")
    val out = Concentration.benford(df, "v")
      .collect().map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    // 0 and negative are excluded; 0.5 -> 5, 23.7 -> 2, 900 -> 9
    assert(out === Map(1 -> 1L, 5 -> 1L, 2 -> 1L, 9 -> 1L))
  }

  test("benford: p_exp sums to 1 and chi2 terms are finite") {
    val df = (1 to 500).map(i => math.pow(1.3, i % 37) * 1.7).toDF("v")
    val rows = Concentration.benford(df, "v").collect()
    val pexp = rows.map(_.getAs[Double]("p_exp")).sum
    assert(math.abs(pexp - 1.0) < 1e-4)
    assert(rows.forall(r => !r.getAs[Double]("chi2_term").isNaN))
  }

  test("zipfSlope: matches a direct least-squares replay") {
    val tokens = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("w")
    val r = Concentration.zipfSlope(tokens, "w", topN = 4).collect().head
    // replay with plain doubles on the same 8-dp-rounded logs
    def r8(x: Double) = math.rint(math.log(x) * 1e8) / 1e8
    val xs = (1 to 4).map(i => r8(i.toDouble))
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(r8)
    val (n, sx, sy) = (4.0, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5)
    assert(r.getAs[Long]("n_tokens") === 4L)
  }
}
