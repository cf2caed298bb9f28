package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Split fixed-point sums: engine-exact, order-independent aggregation
  * of unit-scale doubles WITHOUT the BigDecimal tax (measured ~50× on
  * the covariance matrix — see SCALE.md "engine-exact covariance").
  *
  * Each per-row value is rounded at 1e-15 to an integer p (one
  * deterministic IEEE op; |p| < 2^49 for |x| ≲ 500), split into 24-bit
  * halves hi = ⌊p/2^24⌋ (power-of-two scaling — exact in double) and
  * lo = p − hi·2^24 ∈ [0, 2^24); both halves sum as plain codegen'd
  * LONGS — exact and overflow-safe past 10^11 rows. [[rebuild]] is a
  * fixed chain of IEEE double ops any engine reproduces bit-for-bit
  * (hugeint/long → double casts round-to-nearest identically), so a
  * SQL oracle replaying the same algebra hash-matches. The 1e-15
  * quantization is part of the operator contract: 5e-16 absolute
  * error, orders below a 6-dp output rounding.
  */
object FixedPoint {

  private val Shift = 16777216.0 // 2^24

  /** Quantize to 1e-15 fixed point as a long — round half away from
    * zero spelled as `floor(|x|·1e15 + 0.5)` so the whole conversion
    * is native floor/negate arithmetic. (The obvious `round()` goes
    * through BigDecimal per row in Spark — measured 16× slower across
    * a 20M-row covariance explode.)
    */
  def fx(c: Column): Column =
    when(c >= 0, floor(c * 1e15 + lit(0.5)))
      .otherwise(-floor(-(c * 1e15) + lit(0.5))).cast("long")

  /** High 24-bit half of a fixed-point long: arithmetic shift right IS
    * floor division by 2^24, including for negatives — one native op.
    * Oracles must NOT mirror this with `>>`: shift semantics on
    * negative BIGINTs are a cross-version DuckDB hazard — spell the
    * floor division over positive operands instead
    * (`CASE WHEN p >= 0 THEN p // 2^24 ELSE -((-p + 2^24-1) // 2^24) END`,
    * the q_ext_covariance oracle's form), and `q_ext_oracle_canary`
    * pins the driver environment's `>>` behavior in its own ledger row.
    */
  def hi(p: Column): Column = shiftright(p, 24)

  /** Low half, in [0, 2^24). */
  def lo(p: Column): Column = p - shiftright(p, 24) * 16777216L

  /** Exact total from the two long sums, surfaced as double. */
  def rebuild(hiSum: Column, loSum: Column): Column =
    (hiSum.cast("double") * Shift + loSum.cast("double")) / 1e15
}
