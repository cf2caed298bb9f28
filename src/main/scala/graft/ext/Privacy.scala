package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / governance operators for a training-data pipeline:
  * k-anonymity audits (before releasing grouped data or judging
  * re-identification risk of metadata columns) and randomized-response
  * collection with exact debiasing (collecting a sensitive boolean
  * without storing anyone's true answer).
  *
  * Both are count algebra over one keyed shuffle; the randomized coins
  * are integer-hash-derived, so the whole pipeline — including the
  * "random" part — is engine-reproducible and oracle-checkable.
  */
object Privacy {

  /** k-anonymity audit over quasi-identifier columns: one row
    * (k, n_groups, n_violating, n_rows_at_risk, suppression_rate) —
    * the share of rows that would need suppression to publish the
    * table at anonymity level k. One group-by shuffle bounded by the
    * QI domain; exact integers until the one rate division.
    */
  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String], k: Long): DataFrame = {
    val groups = df.groupBy(quasiIdCols.map(col): _*).agg(count(lit(1)).as("n"))
    groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).cast("long").as("n_violating"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("n_rows_at_risk"),
        sum(col("n")).cast("long").as("n_rows"))
      .select(lit(k).as("k"), col("n_groups"), col("n_violating"),
        col("n_rows_at_risk"),
        round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6)
          .as("suppression_rate"))
  }

  /** Warner randomized response with two fair hash-coins: each subject
    * reports their true bit when coin1 is heads, otherwise reports
    * coin2. P(report=1) = p/2 + 1/4, so p̂ = 2·rate − 1/2 debiases
    * exactly. Returns one row:
    * (n, true_rate, reported_rate, debiased, est_ok) where `est_ok`
    * certifies |debiased − true_rate| ≤ tolerance — the accuracy
    * contract of the mechanism at this n.
    *
    * The coins are modular integer hashes of `seedCol` (distinct salt
    * multipliers), so both engines flip IDENTICAL coins: the gate
    * checks the debiasing algebra, not luck. Production would swap the
    * hash for a real RNG; nothing else changes.
    */
  def randomizedResponse(df: DataFrame, seedCol: String, trueBit: Column,
      tolerance: Double): DataFrame = {
    def coin(mult: Long): Column =
      (col(seedCol) * mult % 1000003L) % 2 === 0
    val reported = df.select(
      trueBit.cast("int").as("b"),
      when(coin(2654435761L), trueBit.cast("int"))
        .otherwise(coin(40503L).cast("int")).as("r"))
    reported.agg(
        count(lit(1)).as("n"),
        sum("b").cast("long").as("nb"),
        sum("r").cast("long").as("nr"))
      .select(col("n"),
        round(col("nb").cast("double") / col("n"), 6).as("true_rate"),
        round(col("nr").cast("double") / col("n"), 6).as("reported_rate"),
        round(lit(2.0) * (col("nr").cast("double") / col("n")) - 0.5, 6)
          .as("debiased"),
        (abs(lit(2.0) * (col("nr").cast("double") / col("n")) - 0.5 -
          col("nb").cast("double") / col("n")) <= tolerance).as("est_ok"))
  }
}
