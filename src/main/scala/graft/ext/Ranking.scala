package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the aggregation step a
  * reward-modeling pipeline runs over human (or judge-model) A/B
  * comparisons before training: turn millions of noisy pairwise votes
  * into one Bradley-Terry strength per item.
  *
  * Model: P(i beats j) = p_i / (p_i + p_j). Strengths are fit by the
  * classic MM (minorization-maximization) recurrence [Hunter 2004]:
  *
  *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j)
  *
  * where W_i = total wins of i and n_ij = comparisons between i and j.
  * Each iteration is two broadcast joins (the strengths table is
  * item-sized, tiny next to the vote log) plus one keyed partial agg —
  * the VOTE log never re-shuffles across iterations, only the n_ij
  * pair-count table does, and that is |items|² rows at most.
  *
  * Scale shape: the raw comparison log (the 100 TB side) is reduced
  * ONCE to (winner, loser, n) pair counts by a map-side-combined
  * aggregate; every MM iteration after that touches only the pair
  * counts. Items (models, prompt variants, data sources) number in the
  * thousands, so the per-iteration work is a broadcast join over a
  * table that fits in one executor's L2.
  *
  * Determinism across engines: strengths after each iteration are
  * rounded to 9 decimals BEFORE feeding the next (both engines see
  * bit-identical inputs to every double division), and the published
  * strength rounds to 6.
  */
object Ranking {

  /** Derive pairwise comparisons from scored observations: within each
    * `groupCol` (a user, a prompt, an eval task), every pair of items
    * is compared on its DECIMAL-exact mean score — the higher mean
    * wins; exact ties produce no vote. Output: (winner, loser), one
    * row per (group, unordered item pair).
    *
    * The mean comparison cross-multiplies exact decimal sums
    * (s_a·c_b vs s_b·c_a) so no double division can flip a verdict
    * between engines.
    */
  def pairwiseComparisons(
      df: DataFrame, groupCol: String, itemCol: String,
      scoreCol: String): DataFrame = {
    val per = df
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(itemCol).as("item"))
      .agg(
        sum(round(col(scoreCol), 6).cast("decimal(28,10)")).as("s"),
        count(lit(1)).as("c"))
    val a = per.select(col("g"), col("item").as("item_a"),
      col("s").as("sa"), col("c").as("ca"))
    val b = per.select(col("g"), col("item").as("item_b"),
      col("s").as("sb"), col("c").as("cb"))
    // Means compared after a 9-decimal round of (exact decimal sum
    // cast double) / count — one division on bit-identical inputs, so
    // the verdict cannot diverge between engines; rounded ties drop.
    a.join(b, Seq("g")).filter(col("item_a") < col("item_b"))
      .withColumn("ma", round(col("sa").cast("double") / col("ca"), 9))
      .withColumn("mb", round(col("sb").cast("double") / col("cb"), 9))
      .filter(col("ma") =!= col("mb"))
      .select(
        when(col("ma") > col("mb"), col("item_a")).otherwise(col("item_b"))
          .as("winner"),
        when(col("ma") > col("mb"), col("item_b")).otherwise(col("item_a"))
          .as("loser"))
  }

  /** Fit Bradley-Terry strengths with `iterations` MM steps from a
    * uniform start (p = 1). `comparisons`: (winner, loser) vote rows —
    * the only input that scales; it is aggregated to pair counts in
    * the first job and never touched again. Output per item:
    * (item, n_wins, n_comparisons, strength), strength rounded to 6.
    */
  def bradleyTerry(
      comparisons: DataFrame, winnerCol: String, loserCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // The single pass over the vote log: directed pair counts.
    val directed = comparisons
      .groupBy(col(winnerCol).as("i"), col(loserCol).as("j"))
      .agg(count(lit(1)).as("w"))
    // Symmetrize wins and totals in ONE union+aggregate (no join):
    // each directed row contributes (i, j, wins=w, n=w) forward and
    // (j, i, wins=0, n=w) backward.
    // |items|²-bounded: materialized ONCE so the vote-log reduction
    // runs once instead of being re-inlined into the strengths init
    // and every MM iteration (the r9 plan carried 272 Exchanges for
    // iterations = 2 — graft.ops.Materialize doc)
    val pairs = graft.ops.Materialize.bounded(directed
      .select(col("i"), col("j"), col("w").as("wins_ij"),
        col("w").as("n_ij"))
      .unionByName(directed.select(col("j").as("i"), col("i").as("j"),
        lit(0L).as("wins_ij"), col("w").as("n_ij")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("wins_ij")).as("wins_ij"), sum(col("n_ij")).as("n_ij")))
    var strengths = pairs.groupBy(col("i").as("item"))
      .agg(sum(col("wins_ij")).as("n_wins"),
        sum(col("n_ij")).as("n_comparisons"))
      .withColumn("p", lit(1.0))
    for (_ <- 1 to iterations) {
      val pi = strengths.select(col("item").as("i"), col("p").as("p_i"))
      val pj = strengths.select(col("item").as("j"), col("p").as("p_j"))
      // Per-opponent terms round to 12 and sum as DECIMAL: the MM
      // denominator is then independent of opponent arrival order, so
      // both engines divide bit-identical numbers.
      val denom = pairs
        .join(broadcast(pi), Seq("i"))
        .join(broadcast(pj), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(round(col("n_ij") / (col("p_i") + col("p_j")), 12)
          .cast("decimal(28,14)")).as("denom"))
      // item-sized; the barrier stops the tree doubling per iteration
      // (each round references the previous strengths twice: p_i, p_j)
      strengths = graft.ops.Materialize.bounded(strengths.drop("p")
        .join(broadcast(denom), Seq("item"))
        .withColumn("p",
          round(col("n_wins") / col("denom").cast("double"), 9))
        .drop("denom"))
    }
    strengths.select(col("item"), col("n_wins"), col("n_comparisons"),
      round(col("p"), 6).as("strength"))
  }
}
