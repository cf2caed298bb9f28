package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition diagnostics: source concentration (Gini),
  * Benford first-digit conformance, and Zipf rank-frequency slope.
  *
  * A training-data pipeline watches these as one-row/few-row health
  * gauges per snapshot: a Gini jump means one domain is swallowing the
  * mix, a Benford break in a numeric feed means synthetic or truncated
  * upstream data, a Zipf slope drifting from ≈−1 means boilerplate or
  * dedup failure. Each reduces the full scan to integer sufficient
  * statistics (counts, rank-weighted count sums) so the engines agree
  * exactly, with one IEEE formula at the end.
  */
object Concentration {

  private def d6(c: Column): Column = round(c, 6)

  /** Gini coefficient of `weightCol`-less group sizes: how unevenly
    * `groupCol` values share the rows. One row:
    * (n_groups, n_rows, gini, top_share).
    *
    * Uses the rank formulation G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over
    * groups sorted ascending by (size, group) — the rank weights and
    * sums are exact integers. The rank is a strict-prefix group count
    * + 1 from [[graft.ops.PrefixSum]]'s chunked scan, so even a
    * 10⁸-domain web corpus never funnels through one partition.
    */
  def giniBySize(df: DataFrame, groupCol: String): DataFrame = {
    val sizes = df.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("x"))
      .withColumn("one", lit(1L))
    val ranked = graft.ops.PrefixSum
      .runningTotal(sizes, "x", "one", "p", chunkSpan = 1024L,
        tieBreak = Seq("g"))
      .withColumn("i", col("p") + lit(1L))
    ranked.agg(
        count(lit(1)).as("n_groups"),
        sum(col("x")).as("n_rows"),
        sum(col("i").cast("decimal(38,0)") * col("x")).as("iws"),
        max(col("x")).as("mx"))
      .select(col("n_groups"), col("n_rows"),
        d6(lit(2.0) * col("iws").cast("double") /
          (col("n_groups").cast("double") * col("n_rows").cast("double")) -
          (col("n_groups") + lit(1)).cast("double") / col("n_groups"))
          .as("gini"),
        d6(col("mx").cast("double") / col("n_rows")).as("top_share"))
  }

  /** Benford first-significant-digit profile of a positive column.
    * Output one row per digit 1..9:
    * (digit, n, p_obs, p_exp, chi2_term) with
    * chi2_term = n_total·(p_obs−p_exp)²/p_exp — sum them for the test
    * statistic. The digit is extracted from the INTEGER ⌊value·10⁶⌋
    * rendered as a string, so extraction is exact arithmetic in both
    * engines (no float log10 at the boundary); p_exp = log10(1+1/d)
    * of small exact rationals, rounded at 6 dp.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val scaled = floor(col(valueCol) * 1000000.0).cast("long")
    val digits = df.filter(col(valueCol) > 0)
      .select(substring(scaled.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("n_total"))
    digits.crossJoin(broadcast(total))
      .withColumn("p_obs", col("n").cast("double") / col("n_total"))
      .withColumn("p_exp",
        d6(log10(lit(1.0) + lit(1.0) / col("digit"))))
      .select(col("digit"), col("n"), d6(col("p_obs")).as("p_obs"),
        col("p_exp"),
        d6(col("n_total") * (col("p_obs") - col("p_exp")) *
          (col("p_obs") - col("p_exp")) / col("p_exp")).as("chi2_term"))
  }

  /** Zipf rank-frequency fit over the `topN` most frequent tokens:
    * one row (n_tokens, slope, intercept) from least squares of
    * ln(freq) on ln(rank), rank ordered by (freq desc, token asc) so
    * the token SET and ranks are integer-deterministic. Logs are
    * rounded at 8 dp and carried as ×10⁸ SCALED LONGS (both engines'
    * last-ulp ln differences sit far below the rounding floor, and
    * integer sums sidestep engine-specific decimal-scale adjustment);
    * the scale divides back out in the final double formula. Slope
    * ≈ −1 is healthy natural text.
    */
  def zipfSlope(tokens: DataFrame, tokenCol: String, topN: Int): DataFrame = {
    val freq = tokens.groupBy(col(tokenCol).as("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topN)
    def lscaled(c: Column): Column =
      round(round(log(c), 8) * 1e8).cast("long")
    val ranked = freq.withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
      .select(lscaled(col("rank").cast("double")).as("lx"),
        lscaled(col("c").cast("double")).as("ly"))
    val slope =
      (col("n_tokens").cast("double") * col("sxy") - col("sx") * col("sy")) /
        (col("n_tokens").cast("double") * col("sxx") - col("sx") * col("sx"))
    ranked.agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("lx")).cast("double") / 1e8).as("sx"),
        (sum(col("ly")).cast("double") / 1e8).as("sy"),
        (sum((col("lx").cast("decimal(38,0)") * col("ly")))
          .cast("double") / 1e16).as("sxy"),
        (sum((col("lx").cast("decimal(38,0)") * col("lx")))
          .cast("double") / 1e16).as("sxx"))
      .select(col("n_tokens"),
        d6(slope).as("slope"),
        d6((col("sy") - slope * col("sx")) / col("n_tokens")).as("intercept"))
  }
}
