package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The split fixed-point contract, pinned as properties:
  *
  *  1. fx() reproduces the REFERENCE IEEE sequence (a = x·1e15 in
  *     double; ±floor(|a| + 0.5)) bit-for-bit — the contract is "a
  *     fixed chain of double ops", so the reference IS that chain, not
  *     exact decimal arithmetic;
  *  2. hi/lo decompose exactly: hi·2^24 + lo == p with lo ∈ [0, 2^24);
  *  3. the distributed rebuild from (Σhi, Σlo) matches the exact
  *     BigInt sum of the quantized values to double precision — for
  *     ANY partitioning, which is the point of the scheme (a plain
  *     double sum would drift with partition count; the long sums
  *     cannot).
  */
class FixedPointSpec extends SparkTestBase {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(77L + i)).get)

  // unit-ish scale plus awkward magnitudes, both signs, exact halves
  private val valueGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1.0, 1.0),
    Gen.choose(-500.0, 500.0),
    Gen.choose(-1e-12, 1e-12),
    Gen.oneOf(0.0, -0.0, 0.1, -0.1, 1.0 / 3.0, -2.5e-15, 1.5e-15))

  /** The reference chain — the same IEEE ops the Column expression
    * declares, evaluated by the JVM directly.
    */
  private def refFx(x: Double): Long = {
    val a = x * 1e15
    if (x >= 0) math.floor(a + 0.5).toLong else -math.floor(-a + 0.5).toLong
  }

  test("fx matches the reference IEEE chain; hi/lo decompose exactly") {
    val xs = samples(valueGen, 400)
    val rows = xs.toDF("x")
      .select(col("x"), FixedPoint.fx(col("x")).as("p"))
      .select(col("x"), col("p"),
        FixedPoint.hi(col("p")).as("h"), FixedPoint.lo(col("p")).as("l"))
      .collect()
    rows.foreach { r =>
      val (x, p, h, l) = (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p === refFx(x), s"fx($x): got $p want ${refFx(x)}")
      assert(h * 16777216L + l === p, s"hi/lo do not rebuild p for $x")
      assert(l >= 0 && l < 16777216L, s"lo out of range for $x: $l")
    }
  }

  test("distributed rebuild equals the exact integer sum, any partitioning") {
    samples(Gen.listOfN(500, valueGen), 4).zipWithIndex.foreach { case (xs, i) =>
      val got = xs.toDF("x").repartition(3 + i) // vary the merge shape
        .select(FixedPoint.fx(col("x")).as("p"))
        .agg(sum(FixedPoint.hi(col("p"))).as("sh"),
          sum(FixedPoint.lo(col("p"))).as("sl"))
        .select(FixedPoint.rebuild(col("sh"), col("sl")).as("total"))
        .head().getDouble(0)
      val exact = xs.map(x => BigInt(refFx(x))).sum
      val want = (BigDecimal(exact) / BigDecimal(1e15)).toDouble
      val tol = 4e-15 * math.max(1.0, math.abs(want))
      assert(math.abs(got - want) <= tol, s"rebuild drifted: got $got want $want")
    }
  }

  test("repartitioning never changes the rebuilt total (bit-exact)") {
    val xs = samples(Gen.listOfN(300, valueGen), 1).head
    val totals = Seq(1, 7, 32).map { parts =>
      xs.toDF("x").repartition(parts)
        .select(FixedPoint.fx(col("x")).as("p"))
        .agg(sum(FixedPoint.hi(col("p"))).as("sh"),
          sum(FixedPoint.lo(col("p"))).as("sl"))
        .select(FixedPoint.rebuild(col("sh"), col("sl")).as("t"))
        .head().getDouble(0)
    }
    assert(totals.distinct.size === 1,
      s"partitioning changed the total: $totals")
  }
}
