package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring at corpus scale: a hashed-feature linear
  * classifier (the fastText / Vowpal-Wabbit shape) over tokens — the
  * plan every LEARNED quality / toxicity / domain filter runs at
  * 100 TB: explode tokens → hash into a bounded feature space →
  * broadcast-join the weight table → one partially-aggregated shuffle
  * back to a per-document score. Inference is just a join + aggregate;
  * no model runtime, no UDF.
  *
  * The weights here are a PINNED deterministic table (bucket-derived,
  * SQL-expressible, so the whole scorer is oracle-checkable end to
  * end). Swapping in a trained model changes the table's CONTENTS —
  * broadcast a real weight table, or a quantized embedding matrix —
  * without touching the plan. The feature hash is md5-based (the same
  * engine-portable construction as [[Sampling]]'s thresholds), not
  * xxhash, for the same reason: both engines must agree on every
  * bucket.
  */
object QualityModel {

  /** Feature bucket of a token: first two hex chars of
    * md5(salt ‖ token) as an integer, mod `dim` — 0..min(dim,256)-1.
    * Collisions are the POINT of hashed features (dimensionality is
    * bounded by construction, vocabulary is not).
    */
  def featureBucket(token: Column, dim: Int, salt: String): Column = {
    require(dim >= 2 && dim <= 256, s"dim must be in [2, 256], got $dim")
    pmod(conv(substring(md5(concat(lit(salt), token)), 1, 2), 16, 10).cast("long"),
      lit(dim.toLong))
  }

  /** The pinned weight for a bucket — a fixed mixing formula standing
    * in for trained parameters (kept beside [[weightSql]] so operator
    * and oracle can never drift).
    */
  def bucketWeight(bucket: Column): Column =
    (bucket * lit(2654435761L) % 1000L) / 1000.0 - 0.5

  /** The same weight formula as oracle SQL over a column name. */
  def weightSql(bucket: String): String =
    s"(($bucket * 2654435761) % 1000) / 1000.0 - 0.5"

  /** Per-document quality score: sigmoid of the mean hashed-feature
    * weight, rounded to `scale` for engine-stable thresholds. Output:
    * (idCol, score, keep) with keep = rounded score ≥ `threshold`.
    *
    * Plan: explode → bucket (codegen'd md5) → broadcast-join the
    * `dim`-row weight table → ONE partial-agg shuffle keyed by doc.
    * Token rows never shuffle; the weight table never exceeds `dim`
    * rows.
    */
  def hashedLinearScore(
      df: DataFrame, idCol: String, textCol: String,
      dim: Int = 256, salt: String = "qm",
      threshold: Double = 0.5, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    val weights = broadcast(spark.range(dim)
      .select(col("id").as("bucket"), bucketWeight(col("id")).as("w")))
    val toks = df
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("t"))
      .select(col(idCol), featureBucket(col("t"), dim, salt).as("bucket"))
    toks.join(weights, "bucket")
      .groupBy(col(idCol))
      .agg((sum(col("w")) / count(lit(1))).as("z"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), scale).as("score"))
      .withColumn("keep", (col("score") >= threshold).cast("long"))
  }
}
