package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression probe over embedding vectors —
  * ENGINE-EXACT batch gradient descent, the trainable tier of the
  * quality-classifier stack (fasttext-style linear filters trained on
  * weak labels; here the embeddings table's own labels).
  *
  * Determinism is the whole design. Three standard sources of
  * cross-engine / cross-partitioning drift are each removed:
  *
  *  - Gradient and dot-product SUMS use the split fixed-point primitive
  *    ([[FixedPoint]], the Pca/Drift machinery): every per-term product
  *    quantizes at 1e-15 and sums as longs — bit-exact under any
  *    partitioning or order, replayable in SQL (1e-15 quantization is
  *    part of the operator contract, orders below the 6-dp output).
  *  - The link is the RATIONAL sigmoid `σ̃(z) = 0.5 + 0.5·z/(1+|z|)`
  *    (Elliott 1993's fast sigmoid), not `1/(1+exp(−z))`: libm `exp`
  *    is only ≤1-ulp accurate and differs across engines, which would
  *    leak through the quantizer; σ̃ uses only +,−,×,÷,|·| — all
  *    correctly-rounded IEEE ops every engine reproduces bit-for-bit.
  *  - Weight updates are a FIXED op sequence `w − lr·(g/n)` on exact
  *    inputs; rounds are a bounded constant k (driver holds the d-dim
  *    weight vector between rounds — bounded driver state, the
  *    Lloyd/BpeLearn pattern; lineage resets each round because every
  *    round reads the base table fresh).
  *
  * Scale shape (per round, at any corpus size): posexplode the vectors
  * to (row, j, x) terms, broadcast the d-row weight table, ONE keyed
  * shuffle to rebuild per-row scores, one broadcast join back, ONE
  * d-row shuffle for the gradient. Nothing driver-side ever exceeds d
  * doubles. The same two-shuffle round shape is how any linear model
  * trains on 100 TB; k stays O(10) because a linear probe converges in
  * few batch steps at lr/n scaling.
  */
object LogReg {

  /** σ̃(z) = 0.5 + 0.5·z/(1+|z|) — deterministic rational sigmoid. */
  def fastSigmoid(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** (vec_id, j, x) terms with the double-cast feature value. */
  private def terms(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "x")))

  /** Per-row fixed-point-exact score z_i = Σ_j fx(w_j · x_ij). */
  private def scores(t: DataFrame, weights: DataFrame): DataFrame = {
    val p = FixedPoint.fx(col("x") * col("w"))
    t.join(broadcast(weights), Seq("j"))
      .select(col("vec_id"), FixedPoint.hi(p).as("hi"), FixedPoint.lo(p).as("lo"))
      .groupBy(col("vec_id"))
      .agg(FixedPoint.rebuild(sum(col("hi")), sum(col("lo"))).as("z"))
  }

  /** Train `rounds` batch-GD steps of the binary probe `label == posLabel`
    * and return the final weights, exact under any partitioning.
    */
  def trainWeights(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, posLabel: Int, rounds: Int, lr: Double): Array[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      when(col(labelCol) === posLabel, 1.0).otherwise(0.0).as("y")).cache()
    try {
      val d = base.select(size(col("v"))).head().getInt(0)
      val n = base.count().toDouble
      val t = terms(base, "vec_id", "v")
      var w = Array.fill(d)(0.0)
      (1 to rounds).foreach { _ =>
        val wDf = w.toSeq.zipWithIndex.map { case (wj, j) => (j, wj) }.toDF("j", "w")
        val errs = scores(t, wDf)
          .join(base.select(col("vec_id"), col("y")), Seq("vec_id"))
          .select(col("vec_id"), (fastSigmoid(col("z")) - col("y")).as("e"))
        // g_j = Σ_i fx(e_i · x_ij), exact
        val pg = FixedPoint.fx(col("e") * col("x"))
        val g = t.join(errs, Seq("vec_id"))
          .select(col("j"), FixedPoint.hi(pg).as("hi"), FixedPoint.lo(pg).as("lo"))
          .groupBy(col("j"))
          .agg(FixedPoint.rebuild(sum(col("hi")), sum(col("lo"))).as("g"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        w = w.zipWithIndex.map { case (wj, j) =>
          wj - lr * (g.getOrElse(j, 0.0) / n)
        }
      }
      w
    } finally { base.unpersist(); () }
  }

  /** Gate frame: (j, weight) after `rounds` steps, 6-dp rounded. */
  def train(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      posLabel: Int, rounds: Int, lr: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainWeights(df, idCol, vecCol, labelCol, posLabel, rounds, lr)
      .toSeq.zipWithIndex.map { case (wj, j) => (j, wj) }.toDF("j", "w")
      // round through DECIMAL on both sides (the dsir idiom): Spark's
      // double round goes through the shortest decimal string (HALF_UP
      // on that), DuckDB's rounds the scaled binary — a weight landing
      // on an exact .xxxxxx5 tie would diverge. decimal(28,15) pins the
      // value first; the 6-dp round is then pure decimal HALF_UP in
      // both engines.
      .select(col("j").cast("long").as("j"),
        round(col("w").cast("decimal(28,15)"), 6).cast("double").as("weight"))
  }

  /** Score every row under externally supplied weights and report the
    * threshold-0.5 confusion counts + accuracy — the filter-quality
    * summary a corpus pipeline publishes before applying a trained
    * keep/drop probe. One exploded pass + one d-row broadcast.
    */
  def evalConfusion(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, posLabel: Int, weights: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.zipWithIndex.map { case (wj, j) => (j, wj) }.toDF("j", "w")
    val base = df.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      when(col(labelCol) === posLabel, 1.0).otherwise(0.0).as("y"))
    val z = scores(terms(base, "vec_id", "v"), wDf)
    val scored = z.join(base.select(col("vec_id"), col("y")), Seq("vec_id"))
      .select(col("y"), (fastSigmoid(col("z")) >= 0.5).as("pred"))
    scored.agg(
      sum(when(col("pred") && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && col("y") === 0.0, 1L).otherwise(0L)).as("tn"),
      sum(when(!col("pred") && col("y") === 1.0, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")), 6).as("accuracy"))
  }
}
