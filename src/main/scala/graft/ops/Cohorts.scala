package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey aggregates over an event stream: cohort retention and
  * Markov transition structure — the product-analytics layer on top of
  * [[Funnel]] / sessionization, and (for a training-data engine) the
  * behavioral statistics that drive curriculum/mixture decisions from
  * interaction logs.
  *
  * Scale shape: both operators reduce the raw scan to per-user keyed
  * work (one shuffle on the user key), then aggregate tables bounded
  * by |cohorts|·|offsets| or |event types|² — tiny at any corpus size.
  * Ratios divide exact integer counts, so both engines agree.
  */
object Cohorts {

  private val WeekSeconds = 604800L

  /** Weekly cohort retention: users grouped by first-seen week; for
    * each (cohort_week, week_offset), the DISTINCT users active that
    * week, the cohort size, and the retention rate. Offset 0 row
    * doubles as the cohort-size sanity check (rate = 1).
    */
  def weeklyRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = df.select(col(userCol).as("u"),
      (floor(unix_timestamp(col(tsCol)) / WeekSeconds)).cast("long").as("w"))
    val firstWeek = weeks.groupBy("u").agg(min("w").as("w0"))
    val sizes = firstWeek.groupBy("w0").agg(count(lit(1)).as("cohort_size"))
    weeks.join(firstWeek, "u")
      .groupBy(col("w0").as("cohort_week"), (col("w") - col("w0")).as("week_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
      .join(sizes.withColumnRenamed("w0", "cohort_week"), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("rate"))
  }

  /** First-order Markov transition matrix of `typeCol` within each
    * user's (ts, id)-ordered event sequence: (from_type, to_type, n,
    * p) where p is row-normalized over from_type. The lead is a keyed
    * window (per user — [[ChunkedWindow]] applies if one user ever
    * outgrows a partition); the transition table is |types|².
    */
  def markovTransitions(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("row_total"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_total"), 6).as("p"))
  }

  /** Daily acquisition curve: per day, the count of users seen for the
    * FIRST time and the cumulative user base — the growth chart next
    * to [[weeklyRetention]]. One user-keyed min aggregate (the only
    * data-sized shuffle) reduces to a |days|-row table; the cumulation
    * is a broadcast triangular self-join of that table, never a
    * window. Output: (day, n_new, cum_users).
    */
  def cumulativeNewUsers(df: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firstSeen = df.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("day"))
    val perDay = firstSeen.groupBy("day").agg(count(lit(1)).as("n_new"))
    perDay
      .join(broadcast(perDay.select(col("day").as("d2"),
        col("n_new").as("n2"))), col("d2") <= col("day"))
      .groupBy("day", "n_new")
      .agg(sum("n2").cast("long").as("cum_users"))
  }

  /** Ordered sequential-pattern support (the k=2 PrefixSpan cell): for
    * every ordered type pair (a, b), how many users did SOME a-event
    * strictly before SOME b-event — "viewed then purchased", gaps
    * allowed. [[markovTransitions]] counts ADJACENT steps; this counts
    * eventual ordering, which is what funnel hypotheses ask.
    *
    * Exact reduction: "∃ a before b" ⟺ min(ts_a) < max(ts_b), so one
    * (user, type) min/max aggregate (the only data-sized shuffle)
    * feeds a per-user type-pair join whose fan-out is |types|², not
    * events². Output: (t_first, t_then, n_users, support).
    */
  def sequenceSupport(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val spans = df.groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(TimeOps.epochSeconds(col(tsCol))).as("fts"),
        max(TimeOps.epochSeconds(col(tsCol))).as("lts"))
    val total = spans.select("u").distinct()
      .agg(count(lit(1)).as("n_total"))
    spans.select(col("u"), col("t").as("t_first"), col("fts"))
      .join(spans.select(col("u"), col("t").as("t_then"), col("lts")), "u")
      .filter(col("t_first") =!= col("t_then") && col("fts") < col("lts"))
      .groupBy("t_first", "t_then")
      .agg(countDistinct(col("u")).as("n_users"))
      .crossJoin(broadcast(total))
      .select(col("t_first"), col("t_then"), col("n_users"),
        round(col("n_users").cast("double") / col("n_total"), 6)
          .as("support"))
  }
}
