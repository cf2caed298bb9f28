package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  test("reduce: capacity decrement drops lightweights, never the heavy item's lead") {
    val mg = HeavyHitters.MisraGries(3)
    // stream: a a a b c — capacity 2 entries
    val b = Seq("a", "a", "a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    // a must survive with est >= 3 - 5/3
    assert(b.contains("a") && b("a") >= 2L)
  }

  test("merge: over-capacity union subtracts the k-th largest and stays bounded") {
    val mg = HeavyHitters.MisraGries(3)
    val merged = mg.merge(Map("a" -> 10L, "b" -> 2L), Map("c" -> 5L, "a" -> 1L))
    // 3 entries > k-1=2 -> subtract kth largest (2): a=9, c=3, b dropped
    assert(merged === Map("a" -> 9L, "c" -> 3L))
    assert(merged.size <= 2)
  }

  test("property: the MG theorem holds for random streams, sizes, and merge shapes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // zipf-ish streams over a small alphabet so some items cross N/k
    val streamGen = Gen.listOfN(800,
      Gen.frequency((8, Gen.const("hot")), (4, Gen.const("warm")),
        (1, Gen.oneOf(('a' to 'p').map(_.toString)))))
    (1 to 4).foreach { i =>
      val xs = sample(streamGen, 1000L + i)
      val k = 3 + i * 2
      val n = xs.size.toLong
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mg = org.apache.spark.sql.functions.udaf(HeavyHitters.MisraGries(k))
      val summary = xs.toDF("w").repartition(2 + i)
        .agg(mg($"w"))
        .head().getMap[String, Long](0)
      exact.foreach { case (item, c) =>
        if (c * k > n)
          assert(summary.contains(item),
            s"k=$k: heavy item $item (count $c of $n) missing from $summary")
        summary.get(item).foreach { est =>
          assert(est <= c && est.toDouble >= c - n.toDouble / k,
            s"k=$k: estimate $est for $item outside [${c - n.toDouble / k}, $c]")
        }
      }
      assert(summary.size <= k - 1, s"summary over capacity: $summary")
    }
  }

  test("distributed contract: every item over N/k present, estimates undercount-bounded") {
    // 1000 tokens over 26 letters, heavily skewed to 'z' (freq ~ 1/3)
    // with k=5 the 4-entry summary must keep 'z'
    val tokens = ((1 to 334).map(_ => "z") ++
      (1 to 666).map(i => ('a' + i % 25).toChar.toString)).toDF("w")
      .repartition(7) // force nontrivial partial-summary merges
    val out = HeavyHitters.heavyHitterContract(tokens, "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).contains("z"))
    assert(out.forall { case (_, present, bound) => present == 1L && bound == 1L })
  }
}
