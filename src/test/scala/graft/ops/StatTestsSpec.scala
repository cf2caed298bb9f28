package graft.ops

import graft.SparkTestBase

class StatTestsSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("ksTwoSample: disjoint supports give D=1 at the last A value") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = StatTests.ksTwoSample(df, "v", col("g") === "a").collect().head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("ks_d") === 1.0)
    assert(r.getAs[Double]("d_at") === 3.0)
  }

  test("ksTwoSample: interleaved values, earliest location of the supremum") {
    // CDF diffs at v=1..4: .5, 0, .5, 0 -> D=.5 first attained at v=1
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val r = StatTests.ksTwoSample(df, "v", col("g") === "a").collect().head
    assert(r.getAs[Double]("ks_d") === 0.5)
    assert(r.getAs[Double]("d_at") === 1.0)
  }

  test("mannWhitneyU: A strictly below B gives U_A=0, U_B=nA*nB") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = StatTests.mannWhitneyU(df, "v", col("g") === "a").collect().head
    assert(r.getAs[Double]("u_a") === 0.0)
    assert(r.getAs[Double]("u_b") === 4.0)
    assert(r.getAs[Double]("z") < 0)
  }

  test("mannWhitneyU: a cross-group tie counts half") {
    // A={1,2}, B={2,3}: pairs (1<2),(1<3),(2=2 half),(2<3) -> U_A = 0.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = StatTests.mannWhitneyU(df, "v", col("g") === "a").collect().head
    assert(r.getAs[Double]("u_a") === 0.5)
    assert(r.getAs[Double]("u_b") === 3.5)
  }

  test("spearman: monotone association is exactly ±1 regardless of shape") {
    val up = (1 to 20).map(i => ("k", i.toDouble, (i * i).toDouble))
    val dn = (1 to 20).map(i => ("j", i.toDouble, (100 - i * i).toDouble))
    val df = (up ++ dn).toDF("k", "x", "y")
    val out = StatTests.spearman(df, "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(out("k") === 1.0)
    assert(out("j") === -1.0)
  }

  test("spearman: constant side yields null, not a crash") {
    val df = (1 to 5).map(i => ("k", i.toDouble, 7.0)).toDF("k", "x", "y")
    val r = StatTests.spearman(df, "k", "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  test("welchT: hand case with unequal variances") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val r = StatTests.welchT(df, "v", col("g") === "a").collect().head
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 4.0)
    // t = (2-4)/sqrt(1/3 + 4/3) = -2/sqrt(5/3)
    assert(math.abs(r.getAs[Double]("t") - -1.549193) < 1e-6)
    // Welch-Satterthwaite: (5/3)^2 / (1/18 + 16/18) = 50/17
    assert(math.abs(r.getAs[Double]("df") - 50.0 / 17.0) < 1e-6)
  }

  test("gofChiSquare: perfect fit scores 0, hand case matches") {
    val perfect = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("cat")
    val p = StatTests.gofChiSquare(perfect, "cat",
      Seq("a" -> 0.8, "b" -> 0.2)).collect().head
    assert(p.getAs[Long]("n") === 10L && p.getAs[Long]("k") === 2L)
    assert(p.getAs[Double]("chi2") === 0.0)
    assert(p.getAs[Long]("df") === 1L)
    // observed 6/4 vs expected 8/2: (6-8)^2/8 + (4-2)^2/2 = 0.5 + 2
    val skew = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).toDF("cat")
    val r = StatTests.gofChiSquare(skew, "cat",
      Seq("a" -> 0.8, "b" -> 0.2)).collect().head
    assert(r.getAs[Double]("chi2") === 2.5)
  }

  test("gofChiSquare: expected-but-absent counts, unexpected nulls the stat") {
    // 'b' expected but absent: (0-2)^2/2 = 2, plus (10-8)^2/8 = 0.5
    val onlyA = Seq.fill(10)("a").toDF("cat")
    val r = StatTests.gofChiSquare(onlyA, "cat",
      Seq("a" -> 0.8, "b" -> 0.2)).collect().head
    assert(r.getAs[Double]("chi2") === 2.5)
    // a category outside the declared recipe is a loud null, not skew
    val stray = (Seq.fill(9)("a") ++ Seq("z")).toDF("cat")
    val s = StatTests.gofChiSquare(stray, "cat",
      Seq("a" -> 0.8, "b" -> 0.2)).collect().head
    assert(s.isNullAt(s.fieldIndex("chi2")))
  }
}
