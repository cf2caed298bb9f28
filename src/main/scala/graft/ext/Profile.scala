package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling / validation primitives (the deequ-style tier a
  * training-data pipeline runs before it trusts a new corpus drop):
  * one-pass per-column profiles and referential-integrity checks.
  *
  * Reference scope note: the reference pipeline validates its inputs
  * ad hoc (required-column checks, NA drops); this module is the
  * engine-level generalization of that tier for arbitrary tables.
  */
object Profile {

  /** Per-column profile in long format: column, n_rows, n_null,
    * null_frac, n_distinct, min/max (stringified so heterogeneous
    * column types share one schema).
    *
    * Single aggregate over one scan. Exact distinct counts compile to
    * Expand (one grouping per distinct column) — the right gate
    * semantics; at corpus scale swap in [[approxProfile]], whose
    * HLL-sketch distincts keep the plan a single pass with no Expand.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value")).as(structName(c))
    }
    explodeProfiles(df, cols, perCol)
  }

  /** [[profile]] with sketch-based distinct counts — single pass, no
    * Expand, the 100 TB shape. Estimates, so spec-gated, not
    * oracle-gated (`rsd` = HLL++ relative standard deviation).
    */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(col(c), rsd).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value")).as(structName(c))
    }
    explodeProfiles(df, cols, perCol)
  }

  // Struct aggregates get predictable aliases so the explode can
  // reference them; backticks guard dotted/spaced source column names.
  private def structName(c: String): String = s"profile_$c"

  private def explodeProfiles(
      df: DataFrame, cols: Seq[String],
      perCol: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), perCol: _*)
      .select(col("n_rows"),
        explode(array(cols.map(c => col(s"`${structName(c)}`")): _*)).as("p"))
      .select(
        col("p.column").as("column"),
        col("n_rows"),
        col("p.n_null").as("n_null"),
        round(col("p.n_null").cast("double") / greatest(col("n_rows"), lit(1L)), 6)
          .as("null_frac"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"),
        col("p.max_value").as("max_value"))

  /** Referential-integrity check: child rows whose `fkCol` value has no
    * match in `parent.pkCol` (NULL fks are not violations, matching SQL
    * FK semantics). Returns one row: n_child, n_orphans, orphan_frac.
    * Plan: one anti-join — broadcast when the parent key side is small,
    * shuffle otherwise; Catalyst picks by stats.
    */
  def fkViolations(
      child: DataFrame, fkCol: String, parent: DataFrame, pkCol: String): DataFrame = {
    val orphans = child.filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
    val nOrphans = orphans.agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(broadcast(nOrphans))
      .select(col("n_child"), col("n_orphans"),
        round(col("n_orphans").cast("double") / greatest(col("n_child"), lit(1L)), 6)
          .as("orphan_frac"))
  }

  /** Key-skew / heavy-hitter profile: the diagnostic a 100 TB operator
    * runs BEFORE choosing between a plain keyed shuffle, salting
    * ([[graft.ops.Salting]]), or an AQE skew-join hint. Emits the topN
    * heaviest keys with their share of all rows and a skew factor
    * (key count ÷ mean per-key count; 1.0 = perfectly uniform).
    *
    * Plan shape survives scale: per-key counts are one map-side-combined
    * hash aggregate (the only full shuffle); the topN rides a bounded
    * heap (`TakeOrderedAndProject` — never a global sort); the
    * grand-total/key-count summary is a one-row broadcast back onto the
    * topN. Skew arithmetic stays in exact integers (`cnt * n_keys`)
    * until the final division so the DuckDB oracle rounds identically.
    */
  /** Equi-width histogram of a numeric column: bucket id =
    * floor(value / width), with per-bucket count and value extrema —
    * one counted shuffle on the bucket id, integer bucket arithmetic
    * identical across engines (negatives floor toward -inf in both).
    */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    df.groupBy(floor(col(valueCol) / width).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col(valueCol)), 6).as("min_v"),
        round(max(col(valueCol)), 6).as("max_v"))
      .withColumn("bucket_lo", col("bucket") * width)
  }

  /** Equi-DEPTH histogram: bins hold (near-)equal row counts instead of
    * equal value ranges — the shape a query optimizer or skew auditor
    * wants when the distribution is heavy-tailed and [[histogram]]'s
    * fixed widths would pile everything into one bucket.
    *
    * Boundaries are the exact interpolated percentiles at k/nBins.
    * `percentile` aggregates in one pass (partial per partition, merge
    * at the driver-side final — a single-row result, NOT a global
    * sort), then broadcasts back: row assignment is a map-side
    * `size(filter(bounds, b -> v > b))`, so the data shuffles once for
    * the per-bin count and never for the boundary computation. At
    * 100 TB the exact percentile's state is the value multiset per
    * partition — swap in approx_percentile when the column has
    * unbounded cardinality; the plan shape is identical.
    *
    * Output: (bin, n, min_v, max_v), bin in [0, nBins).
    */
  def histogramEquiDepth(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 1, s"nBins must exceed 1, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val bounds = df.agg(
      percentile(col(valueCol), lit(ps.toArray)).as("bs"))
    df.select(col(valueCol).as("v"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        size(filter(col("bs"), b => col("v") > b)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 6).as("min_v"),
        round(max(col("v")), 6).as("max_v"))
  }

  def keySkew(df: DataFrame, key: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col(key)).limit(topN)
      .crossJoin(broadcast(summary))
      .select(
        col(key),
        col("cnt"),
        round(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        round((col("cnt") * col("n_keys")).cast("double") / col("total_rows"), 4)
          .as("skew_factor"),
        col("n_keys"),
        col("total_rows"))
  }
}
