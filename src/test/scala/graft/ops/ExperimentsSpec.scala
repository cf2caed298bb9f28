package graft.ops

import graft.SparkTestBase

class ExperimentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(ps: Seq[Double]) =
    Experiments.bhFdr(
      ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "pv"),
      "id", "pv", alphaNum = 1L, alphaDen = 20L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("i"), r.getAs[Boolean]("ok"), r.getAs[Boolean]("rejected")))
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
}
