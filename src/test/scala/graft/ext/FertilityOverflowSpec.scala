package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the q_ext_token_fertility micro-unit spelling against the
  * int64 ceiling (round-7 verdict, What's wrong #3): a 100 TB corpus
  * has sum(chars) ≈ 1e14, and the old `(chars * 1000000L) DIV tokens`
  * BIGINT spelling would WRAP silently past 2^63 under non-ANSI Spark
  * arithmetic. The gate routes the ×1e6 pre-multiply through
  * DECIMAL(38,0); this spec drives the exact expression with a
  * synthetic group whose sum(chars) > 2^43 (the wrap threshold for
  * ×1e6) and asserts the exact quotient.
  */
class FertilityOverflowSpec extends SparkTestBase {
  import spark.implicits._

  private val decimalDiv =
    "CAST((CAST(chars AS DECIMAL(38,0)) * 1000000) DIV bpe_tokens AS BIGINT)"

  test("decimal-routed micro-unit DIV is exact past the int64 x1e6 ceiling") {
    // chars = 1e13 > 2^43 ≈ 8.8e12: chars * 1e6 = 1e19 > 2^63 ≈ 9.2e18
    val g = Seq((10_000_000_000_000L, 4_000_000_000_000L))
      .toDF("chars", "bpe_tokens")
    val got = g.select(expr(decimalDiv).as("m")).head().getLong(0)
    assert(got === 2_500_000L, s"expected exact 2.5e6 micro-units, got $got")
  }

  test("the old BIGINT spelling demonstrably breaks at the same input") {
    // under ANSI (the session default) the ×1e6 multiply THROWS
    // ARITHMETIC_OVERFLOW; under non-ANSI it would wrap to garbage —
    // either way the plain-BIGINT spelling cannot survive 100 TB sums
    val g = Seq((10_000_000_000_000L, 4_000_000_000_000L))
      .toDF("chars", "bpe_tokens")
    val r = scala.util.Try(
      g.select(expr("(chars * 1000000L) DIV bpe_tokens").as("m"))
        .head().getLong(0))
    assert(r.isFailure || r.get != 2_500_000L,
      "the BIGINT spelling no longer overflows — revisit whether the " +
        "decimal route is still needed")
  }

  test("gate-scale values are unchanged by the decimal route") {
    val g = Seq((123456L, 23456L)).toDF("chars", "bpe_tokens")
    val dec = g.select(expr(decimalDiv).as("m")).head().getLong(0)
    val plain = g.select(
      expr("(chars * 1000000L) DIV bpe_tokens").as("m")).head().getLong(0)
    assert(dec === plain)
    assert(dec === 123456L * 1000000L / 23456L)
  }
}
