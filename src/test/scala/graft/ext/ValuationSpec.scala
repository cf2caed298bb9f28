package graft.ext

import graft.SparkTestBase

class ValuationSpec extends SparkTestBase {
  import spark.implicits._

  test("sourceJackknife: LOO means from sufficient statistics") {
    // a: {10, 20} mean 15; b: {40} mean 40. overall mean = 70/3.
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0)).toDF("src", "m")
    val rows = Valuation.sourceJackknife(df, "src", "m")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = rows("a")
    assert(a.getAs[Long]("n") === 2L)
    assert(a.getAs[Double]("mean_source") === 15.0)
    assert(a.getAs[Double]("mean_overall") === d6(70.0 / 3.0))
    assert(a.getAs[Double]("mean_without") === 40.0)
    // removing the cheap source RAISES the corpus mean
    assert(a.getAs[Double]("delta") === d6(40.0 - 70.0 / 3.0))
    val b = rows("b")
    assert(b.getAs[Double]("mean_without") === 15.0)
    assert(b.getAs[Double]("delta") === d6(15.0 - 70.0 / 3.0))
  }

  test("sourceJackknife: a source owning the whole corpus reports null LOO") {
    val df = Seq(("only", 1.0), ("only", 3.0)).toDF("src", "m")
    val r = Valuation.sourceJackknife(df, "src", "m").collect().head
    assert(r.isNullAt(r.fieldIndex("mean_without")))
    assert(r.isNullAt(r.fieldIndex("delta")))
  }
}
