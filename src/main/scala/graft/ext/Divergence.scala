package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution distance between corpus slices — Jensen–Shannon
  * divergence over token distributions (Lin 1991). THE corpus-mix
  * question: "how far is source A's language from source B's?" drives
  * mixture reweighting ([[Sampling.mixBySource]] temperatures), domain
  * routing, and drift alarms on text the way [[Drift]] alarms on
  * embeddings. JSD is the right metric here because it is symmetric,
  * bounded ([0,1] in bits), and defined even where supports differ —
  * raw KL explodes on any token one side lacks.
  *
  *   JSD(P‖Q) = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2,  0·log 0 = 0.
  *
  * Scale shape: one (token)-keyed partial-agg shuffle builds the
  * paired count table (ca, cb); totals broadcast back; every token's
  * contribution is a per-row expression and the final reduce is one
  * row. Nothing is all-pairs; vocabulary never leaves the executor
  * tier unreduced.
  *
  * Exactness: the guide's summation discipline — each token's term is
  * computed from exact integer counts with identical double algebra,
  * ROUNDED at 9 dp, then summed as DECIMAL, so cross-partition
  * accumulation order cannot move the 6-dp result (the bigram-LM
  * pattern).
  */
object Divergence {

  /** One-row JSD report between `sideExpr`-true and -false slices of
    * `tokenCol`: (n_tokens_a, n_tokens_b, n_vocab, jsd_bits).
    */
  def jensenShannonTokens(df: DataFrame, tokenCol: String,
      sideACol: String): DataFrame = {
    val counts = df.groupBy(col(tokenCol).as("t"))
      .agg(sum(when(col(sideACol), 1L).otherwise(0L)).as("ca"),
        sum(when(!col(sideACol), 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val joined = counts.crossJoin(broadcast(totals))
    // p, q, m from exact integer counts; identical double algebra in
    // the oracle. log2 spelled as log(x)/log(2) in BOTH engines so the
    // rounding sequence matches exactly.
    val p = col("ca").cast("double") / col("na")
    val q = col("cb").cast("double") / col("nb")
    val m = (p + q) / lit(2.0)
    def term(x: org.apache.spark.sql.Column) =
      when(x > 0.0, x * (log(x / m) / log(lit(2.0)))).otherwise(lit(0.0))
    val contrib = (term(p) + term(q)) / lit(2.0)
    joined
      .select(col("na"), col("nb"),
        round(contrib, 9).cast("decimal(28,9)").as("_c"))
      .groupBy(col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"))
      .agg(count(lit(1)).as("n_vocab"),
        round(sum(col("_c")).cast("double"), 6).as("jsd_bits"))
  }
}
