package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite, evaluated in ONE
  * aggregation pass — the admission gate a training-data pipeline runs
  * on every ingested batch before it is allowed to join the corpus
  * (the pattern popularized by Deequ / Great Expectations, rebuilt
  * Spark-first).
  *
  * Why one pass matters at 100 TB: the naive spelling is one
  * scan-and-aggregate PER constraint; a ten-constraint suite would
  * read the batch ten times. Here every constraint contributes
  * conditional-count columns to a single `df.agg(...)`, so the whole
  * suite is one scan + one partial-agg shuffle of a SINGLE row,
  * whatever the constraint count. Uniqueness checks use
  * `count(DISTINCT col)` — Catalyst plans multiple distincts in the
  * same Aggregate via one Expand, still a single pass over the data.
  * The per-constraint report rows are exploded from the one aggregated
  * row, never collected to the driver.
  *
  * Exactness: every observed metric is an integer-count ratio; both
  * engines perform the identical long/long → double division, so the
  * 6-dp rounding in the gate query cannot straddle engines.
  */
object Expectations {

  /** One declarative constraint. `observed` is the metric (a ratio in
    * [0, 1] computed from aggregate counts over `df`); `passed` is the
    * decision against the constraint's threshold.
    */
  sealed trait Check {
    def name: String
    def column: String
    def threshold: Double
    /** Aggregate expression producing the observed ratio. `n` is the
      * pre-built total row count aggregate (shared by all checks).
      */
    def observed(n: Column): Column
    def passed(observed: Column): Column = observed >= lit(threshold)
  }

  /** Fraction of rows with a non-null value must be >= `threshold`. */
  case class NotNull(column: String, threshold: Double) extends Check {
    val name = "not_null"
    def observed(n: Column): Column =
      sum(when(col(column).isNotNull, 1L).otherwise(0L)) / greatest(n, lit(1L))
  }

  /** Distinct non-null values / non-null rows must be >= `threshold`
    * (1.0 = the column is a key). The distinct count rides the same
    * Aggregate via Expand — still one scan.
    */
  case class Unique(column: String, threshold: Double = 1.0) extends Check {
    val name = "unique"
    def observed(n: Column): Column =
      countDistinct(col(column)) /
        greatest(sum(when(col(column).isNotNull, 1L).otherwise(0L)), lit(1L))
  }

  /** Fraction of NON-NULL values inside the accepted set must be
    * >= `threshold` (nulls are NotNull's business, not this check's).
    */
  case class InSet(column: String, allowed: Seq[String], threshold: Double)
      extends Check {
    val name = "in_set"
    def observed(n: Column): Column =
      sum(when(col(column).isin(allowed: _*), 1L).otherwise(0L)) /
        greatest(sum(when(col(column).isNotNull, 1L).otherwise(0L)), lit(1L))
  }

  /** Fraction of non-null values inside [lo, hi] must be >= `threshold`. */
  case class Between(column: String, lo: Double, hi: Double, threshold: Double)
      extends Check {
    val name = "between"
    def observed(n: Column): Column =
      sum(when(col(column).isNotNull &&
            col(column) >= lit(lo) && col(column) <= lit(hi), 1L).otherwise(0L)) /
        greatest(sum(when(col(column).isNotNull, 1L).otherwise(0L)), lit(1L))
  }

  /** Fraction of non-null values fully matching `regex` must be
    * >= `threshold` (anchored match, the `rlike`-on-`^...$` spelling).
    */
  case class Matches(column: String, regex: String, threshold: Double)
      extends Check {
    val name = "matches"
    def observed(n: Column): Column =
      sum(when(col(column).rlike(regex), 1L).otherwise(0L)) /
        greatest(sum(when(col(column).isNotNull, 1L).otherwise(0L)), lit(1L))
  }

  /** Evaluate the whole suite in one aggregation pass. Returns one row
    * per check: (constraint, col_name, observed, threshold, passed),
    * observed rounded to 6 dp (integer-ratio exact, see object doc).
    */
  def suite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectation suite needs at least one check")
    val n = count(lit(1L))
    // One aggregate row carrying every observed metric...
    val aggCols = n.as("_n") +:
      checks.zipWithIndex.map { case (c, i) => c.observed(n).as(s"_obs_$i") }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    // ...exploded into the per-constraint report (no driver round-trip).
    // Empty input: conditional sums aggregate to NULL over zero rows —
    // observe 0.0 and FAIL, never a null verdict.
    val reports = checks.zipWithIndex.map { case (c, i) =>
      val raw = coalesce(col(s"_obs_$i"), lit(0.0))
      struct(
        lit(c.name).as("constraint"),
        lit(c.column).as("col_name"),
        round(raw, 6).as("observed"),
        lit(c.threshold).as("threshold"),
        c.passed(raw).cast("long").as("passed"))
    }
    one.select(explode(array(reports: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity audit — the cross-TABLE expectation the
    * single-pass suite can't express: child rows whose `fkCol` has no
    * match in `parent.pkCol`. One row: (n_child, n_fk_keys,
    * n_orphan_rows, n_orphan_keys, orphan_rate).
    *
    * [[Profile.fkViolations]] reports the row-level orphan share (the
    * admission decision); this adds the KEY-level view — how many
    * distinct FK values dangle — which is what the remediation ticket
    * sizes on (one hot missing parent vs a thousand scattered ones).
    *
    * Plan: EVERY output number folds out of one flagged key table —
    * the child partially aggregates to (key, row-count) in one
    * shuffle, the parent to distinct keys in another, the two
    * co-partitioned key tables left-join, and a single scalar
    * aggregate reads off row- and key-level counts together. Neither
    * side is scanned twice and child rows never cross the wire raw.
    * Exact integer counts; one rate division.
    */
  def refIntegrity(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val perKey = child.groupBy(col(fkCol).as("__fk"))
      .agg(count(lit(1)).as("__rows"))
    val keys = parent.select(col(pkCol).as("__fk")).distinct()
      .withColumn("__hit", lit(1))
    perKey.join(keys, Seq("__fk"), "left")
      .agg(
        sum("__rows").cast("long").as("n_child"),
        count(lit(1)).as("n_fk_keys"),
        coalesce(sum(when(col("__hit").isNull, col("__rows"))), lit(0L))
          .cast("long").as("n_orphan_rows"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).cast("long")
          .as("n_orphan_keys"))
      .select(col("n_child"), col("n_fk_keys"), col("n_orphan_rows"),
        col("n_orphan_keys"),
        round(col("n_orphan_rows").cast("double") /
          greatest(col("n_child"), lit(1L)), 6).as("orphan_rate"))
  }
}
