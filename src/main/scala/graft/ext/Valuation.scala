package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-level data valuation by leave-one-out jackknife: for each
  * source (domain, crawl, provider), what happens to a corpus-level
  * mean metric when that source is REMOVED — the cheap first answer to
  * "which data is helping" that mixture tuning ([[Sampling]]'s
  * temperature/water-fill) acts on. A negative delta means the corpus
  * metric drops without the source (it was pulling the average up).
  *
  * The trick that makes it one pass: leave-one-out means need only the
  * per-source sufficient statistics —
  * mean_without_s = (S − S_s)/(N − n_s) — so the whole report is ONE
  * source-keyed partial-agg shuffle plus a broadcast one-row total,
  * never a per-source rescan. Decimal sums; one IEEE division per row.
  */
object Valuation {

  /** Per-source jackknife of the mean of `metricCol`. Output:
    * (source, n, mean_source, mean_overall, mean_without, delta) with
    * delta = mean_without − mean_overall (sign = what removing the
    * source DOES to the corpus). Sources owning the whole corpus
    * report null mean_without rather than 0/0.
    */
  def sourceJackknife(df: DataFrame, sourceCol: String,
      metricCol: String): DataFrame = {
    val in = df.select(col(sourceCol).as("source"),
      round(col(metricCol), 6).cast("decimal(18,6)").as("m"))
    val per = in.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s"))
    val tot = per.agg(sum("n").as("nt"),
      sum(col("s")).as("st"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("mean_source"),
        round(col("st").cast("double") / col("nt"), 6).as("mean_overall"),
        when(col("nt") > col("n"),
          round((col("st") - col("s")).cast("double") /
            (col("nt") - col("n")), 6)).as("mean_without"),
        when(col("nt") > col("n"),
          round((col("st") - col("s")).cast("double") /
            (col("nt") - col("n")) -
            col("st").cast("double") / col("nt"), 6)).as("delta"))
  }
}
