package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-record linkage — the Fellegi–Sunter shape with CURATED
  * integer weights: near-duplicate metadata records (same entity,
  * perturbed fields) that the text-dedup tiers never see, the
  * entity-resolution step a corpus's author/source/license tables run
  * before anything joins on them.
  *
  * Three stages, each scale-shaped:
  *
  *  1. BLOCKING: candidate pairs must share the block key — the
  *     inverted-index idea for structured rows. Pair work is
  *     Σ|block|², never n²; the key's selectivity is the knob, and
  *     [[blockedPairs]]'s `maxBlock` caps a degenerate hot block
  *     (members ranked by id, overflow excluded from pairing) so skew
  *     degrades recall, never wall time — the capBuckets/maxPosting
  *     defense, applied to blocks.
  *  2. FIELD AGREEMENT + SCORE: per-field comparators (exact, bounded
  *     edit distance, numeric tolerance) emit INTEGER log-odds-style
  *     weights, summed per pair — all codegen'd column algebra, and a
  *     BIGINT score is hash-stable across engines where a float score
  *     would not be. Training the weights is an EM loop (Fellegi–
  *     Sunter's m/u estimation) deliberately out of scope: production
  *     linkage overwhelmingly runs curated weights, and the
  *     DISTRIBUTED cost lives in blocking + scoring, not the d-field
  *     weight fit.
  *  3. CLASSIFY: two thresholds — `match` / `possible` (the clerical-
  *     review band) / excluded — per the classic decision model.
  *
  * Output: (id_a, id_b, score, verdict) for pairs at or above
  * `possibleMin`, id_a < id_b.
  */
object Linkage {

  /** Within-block candidate pairs: one shuffle on the block key.
    * `records` must carry `idCol` + `blockCols`; every other column
    * rides along twice, suffixed `_a` / `_b`.
    */
  def blockedPairs(
      records: DataFrame, idCol: String, blockCols: Seq[String],
      maxBlock: Int = 10000): DataFrame = {
    require(blockCols.nonEmpty, "blocking needs at least one key column")
    require(maxBlock > 1, s"maxBlock must exceed 1, got $maxBlock")
    val capW = Window.partitionBy(blockCols.map(col): _*).orderBy(col(idCol))
    val capped = records.withColumn("__br", row_number().over(capW))
      .filter(col("__br") <= maxBlock)
      .drop("__br")
    val others = records.columns.filterNot(c => c == idCol || blockCols.contains(c))
    def side(s: String) = capped.select(
      blockCols.map(col) ++ (col(idCol).as(s"id$s") +: others.map(c => col(c).as(s"$c$s"))): _*)
    side("_a").join(side("_b"), blockCols)
      .filter(col("id_a") < col("id_b"))
  }

  /** Score + classify blocked pairs. `fieldScores` maps each pair of
    * `_a`/`_b` column references to an integer weight column.
    */
  def classify(
      pairs: DataFrame, scores: Seq[Column],
      matchMin: Long, possibleMin: Long): DataFrame = {
    require(matchMin >= possibleMin, "matchMin must be >= possibleMin")
    pairs
      .withColumn("score", scores.reduce(_ + _).cast("long"))
      .filter(col("score") >= possibleMin)
      .withColumn("verdict",
        when(col("score") >= matchMin, lit("match")).otherwise(lit("possible")))
      .select(col("id_a"), col("id_b"), col("score"), col("verdict"))
  }
}
