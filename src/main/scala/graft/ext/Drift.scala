package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding drift monitor: per-dimension moment comparison between a
  * reference snapshot and a new batch — the retrain/recalibrate
  * trigger for every consumer of frozen embedding structure (the IVF
  * quantizer in [[IvfStore]], SemDeDup thresholds, PCA projections).
  * A quantizer trained on last month's corpus silently loses recall as
  * the distribution walks; the drift report is what makes "frozen
  * between scheduled retrains" a monitored contract instead of a hope.
  *
  * Scale shape: one explode + (dim)-keyed partial aggregate per side —
  * the shuffle carries dim-sized groups of [[FixedPoint]] long sums,
  * never vectors; the two dim-sized tables join broadcast-free on the
  * tiny dim key. Engine-exact by the same split fixed-point contract
  * as the covariance matrix, so the oracle replays it cell by cell.
  */
object Drift {

  /** Per-dimension (mean, variance) of both frames plus the absolute
    * mean shift — rounded at `scale` as the operator's contract.
    */
  def embeddingDrift(
      base: DataFrame, batch: DataFrame, vecCol: String,
      scale: Int = 6): DataFrame = {
    import FixedPoint.{fx, hi, lo, rebuild}
    def stats(df: DataFrame, tag: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      df.select(posexplode(v).as(Seq("dim", "v")))
        .select(col("dim").cast("long").as("dim"),
          fx(col("v")).as("__p1"), fx(col("v") * col("v")).as("__p2"))
        .groupBy(col("dim"))
        .agg(
          sum(hi(col("__p1"))).as("__h1"),
          sum(lo(col("__p1"))).as("__l1"),
          sum(hi(col("__p2"))).as("__h2"),
          sum(lo(col("__p2"))).as("__l2"),
          count(lit(1)).as("__n"))
        .select(col("dim"),
          (rebuild(col("__h1"), col("__l1")) / col("__n")).as(s"__m_$tag"),
          (rebuild(col("__h2"), col("__l2")) / col("__n")
            - (rebuild(col("__h1"), col("__l1")) / col("__n"))
            * (rebuild(col("__h1"), col("__l1")) / col("__n"))).as(s"__v_$tag"))
    }
    stats(base, "base").join(stats(batch, "batch"), "dim")
      .select(
        col("dim"),
        round(col("__m_base"), scale).as("mean_base"),
        round(col("__m_batch"), scale).as("mean_batch"),
        round(col("__v_base"), scale).as("var_base"),
        round(col("__v_batch"), scale).as("var_batch"),
        round(abs(col("__m_batch") - col("__m_base")), scale).as("mean_shift"))
  }
}
