package graft.ops

import org.apache.commons.math3.distribution.TDistribution
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Linear-regression aggregation (SURVEY.md §2.4 A2).
  *
  * Reference: `scipy.stats.linregress(ground, cams)` at
  * `/root/reference/code/solrad-compare.py:131-132` → slope, intercept,
  * r, p-value, stderr per irradiance component.
  *
  * Two implementations:
  *  1. [[regrStats]] — Spark's built-in `regr_*` declarative aggregates
  *     (codegen'd, partial-aggregated, one shuffle). Preferred at scale.
  *  2. [[LinRegAggregator]] — a typed `Aggregator` producing the full
  *     scipy 5-tuple (incl. p-value and stderr, which have no SQL
  *     built-in) from one pass of sufficient statistics; p-value from
  *     commons-math3's t-distribution (ships with Spark). This is the
  *     only custom aggregate the reference surface requires (§2.11).
  *
  * Both skip rows where either side is null — `linregress` was fed
  * explicitly NaN-dropped pairs (`solrad-compare.py:126-129`), so n
  * matches.
  */
object LinReg {

  /** Built-in sufficient-stats regression: slope, intercept, r2, n of
    * y over x, per group. Map-side partial aggregation; single shuffle.
    */
  def regrStats(df: DataFrame, y: Column, x: Column, keys: Seq[Column]): DataFrame = {
    val aggs = Seq(
      regr_slope(y, x).as("slope"),
      regr_intercept(y, x).as("intercept"),
      regr_r2(y, x).as("r2"),
      regr_count(y, x).as("n"))
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full scipy-compatible result. */
  case class LinRegResult(
      slope: Double, intercept: Double, r: Double, r2: Double,
      pValue: Double, stderr: Double, n: Long)

  /** Commutative/associative sufficient-stats buffer: Σ1, Σx, Σy, Σx², Σy², Σxy. */
  case class LinRegBuf(n: Long, sx: Double, sy: Double, sxx: Double, syy: Double, sxy: Double) {
    def add(x: Double, y: Double): LinRegBuf =
      LinRegBuf(n + 1, sx + x, sy + y, sxx + x * x, syy + y * y, sxy + x * y)
    def merge(o: LinRegBuf): LinRegBuf =
      LinRegBuf(n + o.n, sx + o.sx, sy + o.sy, sxx + o.sxx, syy + o.syy, sxy + o.sxy)
  }

  /** Finalize scipy linregress semantics from sufficient stats. */
  def finish(b: LinRegBuf): LinRegResult = {
    if (b.n < 2) return LinRegResult(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, b.n)
    val n = b.n.toDouble
    val ssxx = b.sxx - b.sx * b.sx / n
    val ssyy = b.syy - b.sy * b.sy / n
    val ssxy = b.sxy - b.sx * b.sy / n
    if (ssxx == 0.0) return LinRegResult(Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, b.n)
    val slope = ssxy / ssxx
    val intercept = (b.sy - slope * b.sx) / n
    val r = if (ssyy == 0.0) 0.0 else ssxy / math.sqrt(ssxx * ssyy)
    val df = n - 2
    // residual variance from sufficient stats: SSE = ssyy - slope*ssxy
    val sse = math.max(0.0, ssyy - slope * ssxy)
    val stderr = if (df > 0) math.sqrt(sse / df / ssxx) else Double.NaN
    val p =
      if (df <= 0 || stderr == 0.0 || stderr.isNaN) Double.NaN
      else {
        val t = slope / stderr
        2.0 * (1.0 - new TDistribution(df).cumulativeProbability(math.abs(t)))
      }
    LinRegResult(slope, intercept, r, r * r, p, stderr, b.n)
  }

  /** Typed single-pass aggregator over (x, y) pairs. Null/NaN pairs must
    * be filtered upstream (use [[pairs]]).
    */
  class LinRegAggregator extends Aggregator[(Double, Double), LinRegBuf, LinRegResult] {
    def zero: LinRegBuf = LinRegBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)
    def reduce(b: LinRegBuf, in: (Double, Double)): LinRegBuf = b.add(in._1, in._2)
    def merge(a: LinRegBuf, b: LinRegBuf): LinRegBuf = a.merge(b)
    def finish(b: LinRegBuf): LinRegResult = LinReg.finish(b)
    def bufferEncoder: Encoder[LinRegBuf] = Encoders.product[LinRegBuf]
    def outputEncoder: Encoder[LinRegResult] = Encoders.product[LinRegResult]
  }

  /** Column form of the full aggregator: `df.agg(linregFull($"x", $"y"))`. */
  def linregFull(x: Column, y: Column): Column =
    udaf(new LinRegAggregator, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(x, y).as("linreg")
}
