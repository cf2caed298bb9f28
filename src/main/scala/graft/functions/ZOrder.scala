package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values from plain built-in bit arithmetic —
  * the multi-dimensional clustering key behind data-skipping layouts
  * (Delta/Iceberg OPTIMIZE ZORDER): sorting by the interleaved value
  * keeps rows close in BOTH dimensions close in file order, so parquet
  * row-group min/max stats become tight boxes and a 2-D range predicate
  * skips most row groups at scan time.
  *
  * Built from `shiftright`/`&`/`shiftleft`/`|` column compositions only:
  * fully codegen'd, no UDF, no custom Expression, and exactly
  * reproducible in any engine with integer bit ops (the DuckDB oracle
  * respells it operator-for-operator).
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns, `bits` low
    * bits each: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Inputs are masked to `bits` bits (callers bucket/clamp
    * upstream); output fits in 2×bits bits of a long.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton interleave: bit i of dimension j lands at
    * position i·d + j. `bits · cols.size` must fit in 62 bits. The 2-D
    * [[zValue]] is the d=2 special case (same bit layout).
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val d = cols.size
    require(d >= 1, "zValueN needs at least one column")
    require(bits >= 1 && bits * d <= 62,
      s"bits * dims must be in [1, 62], got $bits * $d")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ bitwiseOR _)
  }

  /** [[zValueN]] as DuckDB SQL (BIGINT arithmetic throughout). */
  def zValueSqlN(cols: Seq[String], bits: Int): String = {
    val d = cols.size
    require(d >= 1, "zValueSqlN needs at least one column")
    require(bits >= 1 && bits * d <= 62,
      s"bits * dims must be in [1, 62], got $bits * $d")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * d + j})")
      .mkString("(", " | ", ")")
  }

  /** The same interleave as a DuckDB SQL expression over integer columns
    * `x`/`y` — kept beside the Scala so the two spellings can never
    * drift apart silently.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    // BIGINT casts keep the shifts in 64-bit arithmetic: past bits=15
    // the target positions exceed 31, where INTEGER shifts would
    // overflow in DuckDB while the Scala side (always long) would not —
    // exactly the silent drift this generated spelling exists to prevent
    val (xl, yl) = (s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")
    (0 until bits).map { i =>
      s"((($xl >> $i) & 1) << ${2 * i}) | ((($yl >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }
}
