package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over right-censored durations —
  * "how long until a user converts / a sensor fails / a document is
  * superseded", with subjects still alive at last observation counted
  * as censored, not ignored.
  *
  * The product over event times Π(1 − dᵢ/nᵢ) is inherently
  * sequential; distributed, it becomes exp of a PREFIX SUM of
  * ln(1 − dᵢ/nᵢ) — and prefix sums are exactly what
  * [[PrefixSum.runningTotals]] does without a single-partition window.
  * Determinism: the log terms are rounded at 8 dp and carried as ×10⁸
  * scaled longs (cross-engine ln agrees far below that floor), so the
  * running sums are exact integers; one exp + 6-dp round at the end.
  *
  * Scale shape: one shuffle groups subjects by duration (bounded by
  * the distinct-duration domain), the chunked scan is
  * O(distinct durations), and the at-risk counts fall out of the same
  * scan — no per-subject state anywhere.
  */
object Survival {

  /** Input: one row per subject with (durationCol: long seconds,
    * eventCol: boolean — true = event observed, false = censored).
    * Output: one row per DISTINCT OBSERVED-EVENT time t ascending:
    * (t, n_risk, d, c, s) where d/c are events/censorings at t,
    * n_risk counts subjects with duration ≥ t, and s is the KM
    * survival estimate just after t.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    // distinct-duration-bounded (the module doc's scale contract);
    // materialized because BOTH chunked scans below re-inline every
    // upstream reference — r9's plan carried 186 Exchanges / 49
    // sequential jobs for this query (graft.ops.Materialize doc)
    val perT = graft.ops.Materialize.bounded(df
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("int").as("e"))
      .groupBy("t")
      .agg(sum("e").as("d"), (count(lit(1)) - sum("e")).as("c")))
    val total = perT.agg(sum(col("d") + col("c")).as("n_total"))
    // both chained scans chunk the same distinct-t set at the same
    // span, so they share one materialized directory index (r11)
    val idx = PrefixSum.chunkIndex(perT, "t", 3600L)
    // removed-before-t (events + censorings at strictly smaller t)
    val risked = PrefixSum.runningTotal(
      perT.withColumn("rem", col("d") + col("c")), "t", "rem", "removed",
      chunkSpan = 3600L, sharedIndex = Some(idx))
    // (pass 2's runningTotal materializes its own input, so the chain
    // from `risked` through `lterm` is captured behind that barrier)
    val kmInput = risked.crossJoin(broadcast(total))
      .withColumn("n_risk", col("n_total") - col("removed"))
      // ln(1 − d/n) at event times, ×10⁸ scaled long; 0 where no event.
      // Total extinction (d = n_risk, only possible at the last event
      // time) would be ln 0 — handled as a literal s = 0 below instead.
      .withColumn("lterm",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 8) *
            1e8).cast("long"))
          .otherwise(lit(0L)))
    val scanned = PrefixSum.runningTotal(kmInput, "t", "lterm", "lpfx",
      chunkSpan = 3600L, sharedIndex = Some(idx))
    scanned
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        when(col("d") < col("n_risk"),
          round(exp((col("lpfx") + col("lterm")).cast("double") / 1e8), 6))
          .otherwise(lit(0.0)).as("s"))
  }
}
