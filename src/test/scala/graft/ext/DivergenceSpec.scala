package graft.ext

import graft.SparkTestBase

class DivergenceSpec extends SparkTestBase {
  import spark.implicits._

  private def jsd(rows: Seq[(String, Boolean)]): (Long, Long, Long, Double) = {
    val r = Divergence.jensenShannonTokens(rows.toDF("t", "a"), "t", "a")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("identical distributions diverge by zero") {
    val side = Seq("x", "x", "y")
    val (na, nb, v, d) = jsd(side.map((_, true)) ++ side.map((_, false)))
    assert(na === 3 && nb === 3 && v === 2)
    assert(d === 0.0)
  }

  test("disjoint supports reach the 1-bit maximum") {
    val (_, _, v, d) = jsd(Seq(("x", true), ("y", false)))
    assert(v === 2)
    assert(d === 1.0)
  }

  test("hand case: half overlap") {
    // P uniform on {x,y}; Q all x. m(x)=(0.5+1)/2=0.75, m(y)=0.25.
    // JSD = 0.5*(0.5*lg(0.5/0.75)+0.5*lg(0.5/0.25)) + 0.5*(1*lg(1/0.75))
    val (_, _, _, d) = jsd(Seq(("x", true), ("y", true), ("x", false)))
    val expected = 0.5 * (0.5 * math.log(0.5 / 0.75) / math.log(2.0) +
      0.5 * math.log(2.0) / math.log(2.0)) +
      0.5 * (math.log(1 / 0.75) / math.log(2.0))
    assert(math.abs(d - expected) < 1e-6)
  }

  test("symmetry: swapping sides leaves the divergence unchanged") {
    val rows = Seq(("x", true), ("x", true), ("y", true),
      ("x", false), ("z", false))
    val d1 = jsd(rows)._4
    val d2 = jsd(rows.map { case (t, s) => (t, !s) })._4
    assert(d1 === d2)
  }
}
