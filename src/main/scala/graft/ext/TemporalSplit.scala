package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe TEMPORAL split: train on the past, evaluate on the
  * future. Hash splits ([[Sampling.assignSplit]]) keep marginals but
  * LEAK causally: a model evaluated on events interleaved with its
  * training window has seen the future's neighborhood. The temporal
  * split cuts at a time boundary instead — the only honest split for
  * forecasting-shaped evaluation.
  *
  * The cut is a DAY boundary chosen by exact integer arithmetic, not
  * an interpolated timestamp quantile: percentile interpolation over
  * epoch-microsecond longs carries engine ulp noise right where the
  * comparison bites (a double ulp at 1.7e15 µs is 0.25 µs), while
  * "smallest day whose cumulative row count reaches ⌊n·num/den⌋" is a
  * pure long computation any engine reproduces exactly — and a day
  * boundary is what a practitioner actually deploys ("train through
  * the 24th, evaluate after").
  *
  * Scale shape: one per-day count aggregate (output = |days| rows),
  * cumulative counts via the block-parallel [[graft.ops.PrefixSum]]
  * (no global window, no driver loop), one-row cutoff aggregate
  * broadcast back onto the scan as a pure predicate — the data
  * shuffles zero times for the labeling.
  */
object TemporalSplit {

  /** Add `split` ∈ {train, eval}: train = every row on or before the
    * smallest UTC day whose cumulative count reaches the target
    * fraction. The comparison is cross-multiplied (`cum·den ≥ n·num`)
    * so it stays pure long arithmetic — `/` on longs would promote to
    * double in either engine and reintroduce exactly the rounding this
    * operator exists to avoid.
    */
  def temporalSplit(
      df: DataFrame, tsCol: String, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      s"train fraction must be a rational in [0,1]: $num/$den")
    val day = to_date(col(tsCol)).as("__day")
    val perDay = df.select(day).groupBy(col("__day"))
      .agg(count(lit(1)).as("__c"))
      .select(unix_date(col("__day")).as("__d"), col("__c"))
    val cum = graft.ops.PrefixSum.runningTotal(
      perDay, "__d", "__c", "__p", chunkSpan = 4096L)
    val n = df.agg(count(lit(1)).as("__n"))
    // smallest day with (inclusive cum)·den >= n·num
    val cutoff = cum.crossJoin(broadcast(n))
      .filter((col("__p") + col("__c")) * den >= col("__n") * num)
      .agg(min(col("__d")).as("__cut"))
    df.crossJoin(broadcast(cutoff))
      .withColumn("split",
        when(unix_date(to_date(col(tsCol))) <= col("__cut"), lit("train"))
          .otherwise(lit("eval")))
      .drop("__cut")
  }
}
