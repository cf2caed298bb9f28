package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ExactSelectSpec extends SparkTestBase {
  import spark.implicits._

  private def med(rows: Seq[(String, Double)], buckets: Int = 16,
      cap: Long = 4L) =
    ExactSelect.medianExact(rows.toDF("k", "v"), "k", "v",
        buckets = buckets, resolveCap = cap)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  /** Reference: lower median = the ((n+1)/2)-th smallest. */
  private def naive(vs: Seq[Double]): Double =
    vs.sorted.apply((vs.size + 1) / 2 - 1)

  test("odd and even counts take the lower median, a value from the data") {
    val odd = Seq(5.0, 1.0, 9.0)
    val even = Seq(4.0, 1.0, 3.0, 2.0)
    val m = med(odd.map(("o", _)) ++ even.map(("e", _)))
    assert(m("o") === ((3L, 5.0)))  // rank (3+1)/2 = 2 of {1,5,9}
    assert(m("e") === ((4L, 2.0)))  // rank (4+1)/2 = 2 of {1,2,3,4}
  }

  test("refinement rounds engage and agree with the one-shot sort") {
    // 1000 rows, cap 4: needs several counting rounds.
    val vs = (0 until 1000).map(i => ((i * 37) % 1000).toDouble)
    val m = med(vs.map(("a", _)), buckets = 8, cap = 4L)
    assert(m("a")._2 === naive(vs))
  }

  test("constant key short-circuits; duplicate-heavy key resolves through ties") {
    val const = Seq.fill(100)(7.5)
    val dupes = Seq.fill(60)(1.0) ++ Seq.fill(60)(2.0)
    val m = med(const.map(("c", _)) ++ dupes.map(("d", _)), cap = 8L)
    assert(m("c") === ((100L, 7.5)))
    assert(m("d")._2 === 1.0) // rank 60 of 120 -> still in the 1.0 block
  }

  test("property: matches the naive order statistic on random data") {
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(100L + i)).get)
    val gen = Gen.listOfN(90, Gen.choose(-50.0, 50.0))
    samples(gen, 5).foreach { vs =>
      val rounded = vs.map(v => math.rint(v * 1e4) / 1e4) // avoid 6-dp display noise
      val m = med(rounded.map(("p", _)), buckets = 8, cap = 6L)
      assert(m("p")._2 === naive(rounded), s"vs=${rounded.take(5)}...")
    }
  }
}
