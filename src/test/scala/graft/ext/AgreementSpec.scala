package graft.ext

import graft.SparkTestBase

class AgreementSpec extends SparkTestBase {
  import spark.implicits._

  private def kappa(pairs: Seq[(String, String)]) =
    Agreement.cohenKappa(pairs.toDF("a", "b"), "a", "b").collect().head

  test("perfect agreement with mixed marginals gives kappa 1") {
    val r = kappa(Seq(("x", "x"), ("x", "x"), ("y", "y"), ("z", "z")))
    assert(r.getLong(0) === 4 && r.getLong(1) === 4)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(4) === 1.0)
  }

  test("textbook 2x2 case matches the hand computation") {
    // Confusion: xx=20, xy=5, yx=10, yy=15 -> n=50, po=0.7,
    // pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.2/0.5 = 0.4.
    val pairs =
      Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
        Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val r = kappa(pairs)
    assert(r.getDouble(2) === 0.7)
    assert(r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === 0.4)
  }

  test("both raters constant: pe = 1, kappa null (vacuous, not perfect)") {
    val r = kappa(Seq(("x", "x"), ("x", "x")))
    assert(r.getDouble(3) === 1.0)
    assert(r.isNullAt(4))
  }

  test("disjoint label sets: zero agreement, zero chance, kappa 0") {
    val r = kappa(Seq(("x", "y"), ("x", "y")))
    assert(r.getLong(1) === 0)
    // no shared category -> pe_num empty sum -> null pe and kappa
    assert(r.isNullAt(3) || r.getDouble(3) === 0.0)
  }

  test("krippendorffAlpha: hand coincidence-matrix case") {
    // units (a,a),(a,b),(b,b): Do_num=2, marginals n_a=n_b=3,
    // De_num = 2·3·3 = 18, n = 6 -> alpha = 1 − 5·2/18 = 4/9
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("ra", "rb")
    val r = Agreement.krippendorffAlpha(df, "ra", "rb").collect().head
    assert(r.getAs[Long]("n_units") === 3L)
    assert(r.getAs[Long]("n_categories") === 2L)
    assert(r.getAs[Long]("do_num") === 2L)
    assert(r.getAs[Long]("de_num") === 18L)
    assert(math.abs(r.getAs[Double]("alpha") - 4.0 / 9.0) < 1e-6)
  }

  test("krippendorffAlpha: perfect agreement gives 1, constant raters null") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("ra", "rb")
    assert(Agreement.krippendorffAlpha(perfect, "ra", "rb")
      .collect().head.getAs[Double]("alpha") === 1.0)
    val constant = Seq(("x", "x"), ("x", "x")).toDF("ra", "rb")
    val r = Agreement.krippendorffAlpha(constant, "ra", "rb").collect().head
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }
}
