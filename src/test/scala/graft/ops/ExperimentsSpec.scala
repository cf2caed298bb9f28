package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class ExperimentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(ps: Seq[Double]) =
    Experiments.bhFdr(
      ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "pv"),
      "id", "pv", alphaNum = 1L, alphaDen = 20L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("i"), r.getAs[Long]("ok") == 1L,
          r.getAs[Long]("rejected") == 1L))
      .toMap

  test("bhFdr: simple cut — small ps rejected, large ps kept") {
    // thresholds i/4·0.05: .0125 .025 .0375 .05
    val out = run(Seq(0.01, 0.02, 0.2, 0.9))
    assert(out(0L) === ((1L, true, true)))
    assert(out(1L) === ((2L, true, true)))
    assert(out(2L) === ((3L, false, false)))
    assert(out(3L) === ((4L, false, false)))
  }

  test("bhFdr: step-up rescues earlier non-ok ranks") {
    // sorted .02 .04 .049 vs thresholds .016667 .033333 .05:
    // only rank 3 is ok, but the step-up cut rejects ALL three
    val out = run(Seq(0.02, 0.049, 0.04))
    assert(out.values.forall(_._3))
    assert(out.values.count(_._2) === 1)
  }

  test("bhFdr: nothing significant rejects nothing") {
    val out = run(Seq(0.5, 0.6, 0.7))
    assert(out.values.forall(v => !v._3 && !v._2))
  }

  test("sprt: strong evidence crosses the H1 boundary, sparse evidence continues") {
    // 200 of 250 successes (rate .8) vs H0 p=.5 / H1 p=.6: llr is
    // decisively positive.
    val strong = (1 to 250).map(i => Tuple1(i <= 200)).toDF("ok")
    val r = Experiments.sprt(strong, col("ok"), p0 = 0.5, p1 = 0.6)
      .collect().head
    assert(r.getAs[Long]("n") === 250L && r.getAs[Long]("k") === 200L)
    assert(r.getAs[Long]("accept_h1") === 1L && r.getAs[Long]("accept_h0") === 0L)
    // a handful of mixed observations decides nothing yet
    val few = Seq(true, false, true, false).map(Tuple1(_)).toDF("ok")
    val f = Experiments.sprt(few, col("ok"), p0 = 0.5, p1 = 0.6)
      .collect().head
    assert(f.getAs[Long]("accept_h1") === 0L && f.getAs[Long]("accept_h0") === 0L)
  }

  test("sprt: hand llr value") {
    // n=10, k=4, p0=.4, p1=.5: llr = 4 ln(5/4) + 6 ln(5/6)
    val df = (1 to 10).map(i => Tuple1(i <= 4)).toDF("ok")
    val r = Experiments.sprt(df, col("ok"), p0 = 0.4, p1 = 0.5)
      .collect().head
    val expected = 4.0 * math.log(0.5 / 0.4) + 6.0 * math.log(0.5 / 0.6)
    assert(r.getAs[Double]("llr") ===
      new java.math.BigDecimal(expected)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
  }
}
