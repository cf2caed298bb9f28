package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankingSpec extends SparkTestBase {
  import spark.implicits._

  test("pairwiseComparisons: higher mean wins within group, exact ties drop") {
    val obs = Seq(
      // group 1: a mean 2.0, b mean 1.0, c mean 2.0 (ties a)
      (1L, "a", 3.0), (1L, "a", 1.0),
      (1L, "b", 1.0),
      (1L, "c", 2.0),
      // group 2: b mean 5.0 beats a mean 0.0
      (2L, "a", 0.0), (2L, "b", 5.0)
    ).toDF("g", "item", "score")
    val got = Ranking.pairwiseComparisons(obs, "g", "item", "score")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("c", "b"), ("b", "a")),
      "a>b and c>b in g1, b>a in g2; the a-c tie emits nothing")
  }

  test("bradleyTerry matches the hand MM recurrence") {
    // a beats b 3 times, b beats a once; a beats c twice, c never wins.
    val votes = Seq(
      ("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
      ("a", "c"), ("a", "c")
    ).toDF("winner", "loser")
    // Pair counts: n_ab=4, n_ac=2. W_a=5, W_b=1, W_c=0.
    // it1 (p=1): p_a = 5/(4/2 + 2/2) = 5/3; p_b = 1/(4/2) = 0.5; p_c = 0.
    // it2: p_a = 5/(4/(5/3+.5) + 2/(5/3+0)); p_b = 1/(4/(.5+5/3)); p_c = 0.
    def r(x: Double, n: Int) =
      BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pa1 = r(5.0 / 3, 9); val pb1 = r(0.5, 9); val pc1 = r(0.0, 9)
    val pa2 = r(5.0 / (r(4 / (pa1 + pb1), 12) + r(2 / (pa1 + pc1), 12)), 9)
    val pb2 = r(1.0 / r(4 / (pb1 + pa1), 12), 9)
    val got = Ranking.bradleyTerry(votes, "winner", "loser", iterations = 2)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(got("a") === ((5L, 6L, r(pa2, 6))))
    assert(got("b") === ((1L, 4L, r(pb2, 6))))
    assert(got("c") === ((0L, 2L, 0.0)))
  }

  test("strength ordering follows dominance") {
    val votes = Seq.fill(10)(("strong", "weak")) ++ Seq.fill(6)(("strong", "mid")) ++
      Seq.fill(4)(("mid", "strong")) ++ Seq.fill(7)(("mid", "weak")) ++
      Seq.fill(3)(("weak", "mid"))
    val got = Ranking.bradleyTerry(votes.toDF("winner", "loser"), "winner", "loser")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(got("strong") > got("mid") && got("mid") > got("weak"))
  }
}
