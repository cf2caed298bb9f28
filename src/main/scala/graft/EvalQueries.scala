package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Encode
import graft.ops.{Causal, ForecastEval, TimeOps}

/** Evaluation / experimentation / feature-engineering queries:
  * CUPED, stratified effects, target encoding, mutual information,
  * pinball loss, split-conformal calibration — each a gated
  * (query, DuckDB oracle) pair on the repo's determinism contract.
  */
object EvalQueries {

  /** Per-user pre/post means on alternating epoch days — the unit
    * table for the CUPED gate (parity split guarantees every user has
    * both periods populated at any SF).
    */
  private def userPrePost(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"),
      (floor(unix_timestamp(col("ts")) / 86400L).cast("long") % 2 === 0)
        .as("pre"),
      round(col("value"), 6).cast("decimal(18,6)").as("v"))
    e.groupBy("user_id")
      .agg(
        sum(when(col("pre"), col("v"))).cast("decimal(38,12)").as("sx"),
        sum(when(col("pre"), 1L)).as("nx"),
        sum(when(!col("pre"), col("v"))).cast("decimal(38,12)").as("sy"),
        sum(when(!col("pre"), 1L)).as("ny"))
      .filter(col("nx") > 0 && col("ny") > 0)
      .select(col("user_id"),
        (col("sx").cast("double") / col("nx")).as("x"),
        (col("sy").cast("double") / col("ny")).as("y"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CUPED variance reduction on per-user pre/post metric means.
    "q_ext_cuped" -> ((s, dir) =>
      Causal.cuped(userPrePost(s, dir), col("user_id") % 2 === 0, "y", "x")),

    // Stratified difference-in-means across event-type strata.
    "q_ext_stratified_ate" -> ((s, dir) =>
      Causal.stratifiedEffect(Tables.events(s, dir), "event_type",
        col("user_id") % 2 === 0, "value")),

    // Leave-one-out target encoding of market segment vs balance.
    "q_ext_target_encode" -> ((s, dir) =>
      Encode.targetEncodeLoo(Tables.customer(s, dir), "c_custkey",
        "c_mktsegment", "c_acctbal")),

    // Mutual information between event type and a user bucket.
    "q_ext_mutual_info" -> ((s, dir) =>
      Encode.mutualInfo(
        Tables.events(s, dir).select(col("event_type"),
          (col("user_id") % 7).as("ub")),
        "event_type", "ub")),

    // Pinball loss of climatology quantile forecasts (P10/P50/P90),
    // trained on even epoch days, scored on odd.
    "q_ext_pinball" -> ((s, dir) =>
      ForecastEval.pinballClimatology(Tables.events(s, dir), "event_type",
        "ts", "value",
        floor(unix_timestamp(col("ts")) / 86400L).cast("long") % 2 === 0,
        Seq(10, 50, 90))),

    // Split-conformal interval calibration around seasonal-naive.
    "q_ext_conformal" -> ((s, dir) =>
      ForecastEval.conformalSeasonalNaive(Tables.events(s, dir), "event_type",
        "ts", "value", seasonSeconds = 86400L, alphaPct = 90)),
  )

  private val UserPrePostSql =
    """e AS (
      |  SELECT user_id,
      |         (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 2 = 0 AS pre,
      |         CAST(round(value, 6) AS DECIMAL(18,6)) AS v
      |  FROM events),
      |per AS (
      |  SELECT user_id,
      |         CAST(CAST(sum(CASE WHEN pre THEN v END) AS DECIMAL(38,12))
      |           AS DOUBLE) / sum(CASE WHEN pre THEN 1 END) AS x,
      |         CAST(CAST(sum(CASE WHEN NOT pre THEN v END) AS DECIMAL(38,12))
      |           AS DOUBLE) / sum(CASE WHEN NOT pre THEN 1 END) AS y
      |  FROM e GROUP BY 1
      |  HAVING sum(CASE WHEN pre THEN 1 ELSE 0 END) > 0
      |     AND sum(CASE WHEN NOT pre THEN 1 ELSE 0 END) > 0)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ext_cuped" ->
      s"""WITH $UserPrePostSql,
         |pc AS (
         |  SELECT user_id % 2 = 0 AS t,
         |         CAST(round(y, 6) AS DECIMAL(18,6)) AS y,
         |         CAST(round(x, 6) AS DECIMAL(18,6)) AS x
         |  FROM per),
         |pooled AS (
         |  SELECT count(*) AS n,
         |         CAST(CAST(sum(x) AS DECIMAL(38,12)) AS DOUBLE) AS sx,
         |         CAST(CAST(sum(y) AS DECIMAL(38,12)) AS DOUBLE) AS sy,
         |         CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         |         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         |         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
         |  FROM pc),
         |pd AS (
         |  SELECT n,
         |         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
         |         sx / n AS mx,
         |         ((sxy - sx * sy / n) * (sxy - sx * sy / n))
         |           / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rho2
         |  FROM pooled),
         |arms AS (
         |  SELECT t, count(*) AS na,
         |         CAST(CAST(sum(y) AS DECIMAL(38,12)) AS DOUBLE) / count(*) AS my,
         |         CAST(CAST(sum(x) AS DECIMAL(38,12)) AS DOUBLE) / count(*) AS mxa
         |  FROM pc GROUP BY 1)
         |SELECT a.na AS n_t, b.na AS n_c, round(theta, 6) AS theta,
         |       round(a.my - b.my, 6) AS delta_raw,
         |       round((a.my - theta * (a.mxa - mx))
         |         - (b.my - theta * (b.mxa - mx)), 6) AS delta_cuped,
         |       round(rho2, 6) AS var_reduction
         |FROM arms a, arms b, pd WHERE a.t AND NOT b.t""".stripMargin,

    "q_ext_stratified_ate" ->
      """WITH i AS (
        |  SELECT event_type AS s, user_id % 2 = 0 AS t,
        |         CAST(round(value, 6) AS DECIMAL(18,6)) AS y
        |  FROM events),
        |cells AS (
        |  SELECT s, t, count(*) AS n,
        |         CAST(CAST(sum(y) AS DECIMAL(38,12)) AS DOUBLE) AS sy
        |  FROM i GROUP BY 1, 2),
        |tot AS (SELECT count(*) AS n_all FROM i)
        |SELECT tc.s, tc.n AS n_t, cc.n AS n_c,
        |       round(tc.sy / tc.n, 6) AS mean_t,
        |       round(cc.sy / cc.n, 6) AS mean_c,
        |       round(tc.sy / tc.n - cc.sy / cc.n, 6) AS effect,
        |       round(CAST(tc.n + cc.n AS DOUBLE) / n_all, 6) AS weight
        |FROM cells tc JOIN cells cc ON cc.s = tc.s, tot
        |WHERE tc.t AND NOT cc.t""".stripMargin,

    "q_ext_target_encode" ->
      """WITH i AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(round(c_acctbal, 6) AS DECIMAL(18,6)) AS y
        |  FROM customer),
        |cat AS (
        |  SELECT c_mktsegment, count(*) AS nc,
        |         CAST(sum(y) AS DECIMAL(38,12)) AS sc
        |  FROM i GROUP BY 1),
        |gt AS (
        |  SELECT count(*) AS ng, CAST(sum(y) AS DECIMAL(38,12)) AS sg FROM i)
        |SELECT c_custkey, i.c_mktsegment, CAST(y AS DOUBLE) AS target_r,
        |       round(CASE WHEN nc > 1
        |         THEN CAST(sc - y AS DOUBLE) / (nc - 1)
        |         ELSE CAST(sg - y AS DOUBLE) / (ng - 1) END, 6) AS enc
        |FROM i JOIN cat ON cat.c_mktsegment = i.c_mktsegment, gt""".stripMargin,

    "q_ext_mutual_info" ->
      """WITH cells AS (
        |  SELECT event_type AS a, user_id % 7 AS b, count(*) AS cxy
        |  FROM events GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(sum(cxy) AS BIGINT) AS ca FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(sum(cxy) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM cells),
        |terms AS (
        |  SELECT n.n,
        |         CAST(round(CAST(cxy AS DOUBLE) / n.n
        |           * ln(CAST(cxy AS DOUBLE) * n.n
        |               / (CAST(ca AS DOUBLE) * cb)), 9) AS DECIMAL(28,9))
        |           AS term
        |  FROM cells JOIN ma USING (a) JOIN mb USING (b), n)
        |SELECT max(n) AS n, count(*) AS n_cells,
        |       round(CAST(sum(term) AS DOUBLE), 6) AS mi
        |FROM terms""".stripMargin,

    "q_ext_pinball" ->
      """WITH base AS (
        |  SELECT event_type AS k, CAST(hour(ts) AS INT) AS hod,
        |         round(value, 6) AS y,
        |         (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 2 = 0 AS tr
        |  FROM events),
        |train AS (SELECT * FROM base WHERE tr),
        |ranked AS (
        |  SELECT k, hod, y,
        |         CAST(row_number() OVER (PARTITION BY k, hod ORDER BY y)
        |           AS BIGINT) AS rn
        |  FROM train),
        |cnt AS (SELECT k, hod, count(*) AS n FROM train GROUP BY 1, 2),
        |qq AS (SELECT CAST(unnest([10, 50, 90]) AS BIGINT) AS q_pct),
        |pick AS (
        |  SELECT r.k, r.hod, q.q_pct, c.n, r.rn, r.y,
        |         CAST(q.q_pct AS DOUBLE) / 100.0 * (c.n - 1) AS pos
        |  FROM ranked r JOIN cnt c ON c.k = r.k AND c.hod = r.hod, qq q),
        |sel AS (
        |  SELECT * FROM pick
        |  WHERE rn = CAST(floor(pos) AS BIGINT) + 1
        |     OR rn = least(CAST(floor(pos) AS BIGINT) + 2, n)),
        |fq AS (
        |  SELECT k, hod, q_pct,
        |         max(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1
        |           THEN y END) AS ylo,
        |         max(CASE WHEN rn = least(CAST(floor(pos) AS BIGINT) + 2, n)
        |           THEN y END) AS yhi,
        |         max(pos) AS p
        |  FROM sel GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT k, hod, q_pct,
        |         round(ylo + (p - floor(p)) * (yhi - ylo), 6) AS fv
        |  FROM fq),
        |l AS (
        |  SELECT b.k, f.q_pct,
        |         round(CASE WHEN b.y >= fv
        |           THEN CAST(f.q_pct AS DOUBLE) / 100.0 * (b.y - fv)
        |           ELSE (1.0 - CAST(f.q_pct AS DOUBLE) / 100.0) * (fv - b.y)
        |         END, 6) AS loss
        |  FROM base b JOIN f ON f.k = b.k AND f.hod = b.hod
        |  WHERE NOT b.tr)
        |SELECT k, q_pct, count(*) AS n,
        |       round(CAST(sum(CAST(loss AS DECIMAL(18,6))) AS DOUBLE)
        |         / count(*), 6) AS pinball
        |FROM l GROUP BY 1, 2""".stripMargin,

    "q_ext_conformal" ->
      s"""WITH s AS (${StatQueries.hourlySeriesSqlShared}),
         |hi AS (SELECT k, h + 86400 AS h, m AS f FROM s),
         |paired AS (
         |  SELECT s.k, s.h, round(abs(s.m - hi.f), 6) AS r,
         |         (s.h // 3600) % 2 = 0 AS cal
         |  FROM s JOIN hi ON hi.k = s.k AND hi.h = s.h),
         |calr AS (SELECT k, r FROM paired WHERE cal),
         |ranked AS (
         |  SELECT k, r,
         |         CAST(row_number() OVER (PARTITION BY k ORDER BY r)
         |           AS BIGINT) AS rn
         |  FROM calr),
         |cnt AS (SELECT k, count(*) AS n_cal FROM calr GROUP BY 1),
         |pick AS (
         |  SELECT rk.k, c.n_cal, rk.rn, rk.r,
         |         CAST(90 AS DOUBLE) / 100.0 * (c.n_cal - 1) AS pos
         |  FROM ranked rk JOIN cnt c ON c.k = rk.k),
         |sel AS (
         |  SELECT * FROM pick
         |  WHERE rn = CAST(floor(pos) AS BIGINT) + 1
         |     OR rn = least(CAST(floor(pos) AS BIGINT) + 2, n_cal)),
         |qh AS (
         |  SELECT k, max(n_cal) AS n_cal,
         |         round(max(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1
         |             THEN r END)
         |           + (max(pos) - floor(max(pos)))
         |             * (max(CASE WHEN rn = least(CAST(floor(pos) AS BIGINT) + 2,
         |                 n_cal) THEN r END)
         |               - max(CASE WHEN rn = CAST(floor(pos) AS BIGINT) + 1
         |                 THEN r END)), 6) AS qhat
         |  FROM sel GROUP BY 1),
         |ev AS (
         |  SELECT p.k, qh.n_cal, qh.qhat, count(*) AS n_eval,
         |         CAST(sum(CASE WHEN p.r <= qh.qhat THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_in
         |  FROM paired p JOIN qh ON qh.k = p.k WHERE NOT p.cal
         |  GROUP BY 1, 2, 3)
         |SELECT k, n_cal, n_eval, qhat,
         |       round(CAST(n_in AS DOUBLE) / n_eval, 6) AS coverage,
         |       CAST(n_in AS DOUBLE) / n_eval >= 0.85 AS cov_ok
         |FROM ev""".stripMargin,
  )
}
