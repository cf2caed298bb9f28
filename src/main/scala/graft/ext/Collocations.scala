package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation and token-class association mining over `documents`:
  * PMI bigrams (phrase discovery for tokenizer/vocab curation) and
  * chi-squared token-class association (the feature-selection step in
  * front of a fastText-style quality/language classifier).
  *
  * Both are count algebra: the row SETS are decided purely by integer
  * thresholds (no float ordering), counts reduce exactly, and the one
  * PMI/chi² double formula runs on identical operands in any IEEE
  * engine. Shuffle shape: tokens/bigram keys shuffle, text never does.
  */
object Collocations {

  private def d6(c: Column): Column = round(c, 6)

  /** Lower-cased alpha token array per document, empties removed —
    * order preserved (bigrams need it).
    */
  def tokenArray(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= "").as("ws"))

  /** Pointwise mutual information of adjacent token pairs:
    * pmi = ln(c_xy·N / (c_x·c_y)) with N = total bigram count.
    * Emits every pair with c_xy ≥ minPairCount (an integer-decided
    * set): (x, y, c_xy, c_x, c_y, pmi).
    *
    * Adjacency comes from zipping the token array with its own tail —
    * a map-side explode; the only shuffles aggregate (pair) and
    * (token) keys. All counts fit exact doubles (< 2⁵³) at any corpus
    * where a single token's count fits a long.
    */
  /** Thresholded adjacent-pair counts with positional marginals and
    * the total: (x, y, c_xy, c_x, c_y, n_bigrams) — the shared input
    * of [[pmiBigrams]] and [[llrBigrams]]. Adjacency comes from
    * zipping the token array with its own tail (map-side explode);
    * the only shuffles aggregate (pair) and (token) keys.
    */
  private def bigramCounts(docs: DataFrame, idCol: String, textCol: String,
      minPairCount: Long): DataFrame = {
    val toks = tokenArray(docs, idCol, textCol)
    val tail = greatest(size(col("ws")) - 1, lit(0))
    val bigrams = toks.select(explode(
        zip_with(slice(col("ws"), lit(1), tail), slice(col("ws"), lit(2), tail),
          (a, b) => struct(a.as("x"), b.as("y")))).as("bg"))
      .select(col("bg.x").as("x"), col("bg.y").as("y"))
    val pairCounts = bigrams.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    // positional marginals: c_x = bigrams starting with x, c_y = ending
    // with y — folds of the pair-count table, no second pass over text
    val left = pairCounts.groupBy("x").agg(sum("c_xy").cast("long").as("c_x"))
    val right = pairCounts.groupBy("y").agg(sum("c_xy").cast("long").as("c_y"))
    val n = pairCounts.agg(sum("c_xy").cast("long").as("n_bigrams"))
    pairCounts.filter(col("c_xy") >= minPairCount)
      .join(left, "x")
      .join(right, "y")
      .crossJoin(broadcast(n))
  }

  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
      minPairCount: Long): DataFrame =
    bigramCounts(docs, idCol, textCol, minPairCount)
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        d6(log(col("c_xy").cast("double") * col("n_bigrams") /
          (col("c_x").cast("double") * col("c_y")))).as("pmi"))

  /** Dunning log-likelihood-ratio (G²) collocations over the same
    * adjacent-pair counts as [[pmiBigrams]] — the low-count-robust
    * scorer (Dunning 1993, "Accurate Methods for the Statistics of
    * Surprise and Coincidence"): PMI explodes for rare pairs, G²
    * shrinks toward 0, which is why vocabulary curation ranks by G²
    * when pair counts are small.
    *
    * G² = 2·(Σ xlx(kᵢⱼ) − Σ xlx(rows) − Σ xlx(cols) + xlx(N)) over
    * the 2×2 table [pair, x-without-y, y-without-x, neither], with
    * xlx(c) = c·ln(c) and xlx(0) = 0. Counts are exact longs; the
    * formula is ONE fixed expression tree per row (no float
    * aggregate), so evaluation order is pinned on both engines.
    * Output: (x, y, c_xy, c_x, c_y, llr).
    */
  def llrBigrams(docs: DataFrame, idCol: String, textCol: String,
      minPairCount: Long): DataFrame = {
    def xlx(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    val k11 = col("c_xy")
    val k12 = col("c_x") - col("c_xy")
    val k21 = col("c_y") - col("c_xy")
    val k22 = col("n_bigrams") - col("c_x") - col("c_y") + col("c_xy")
    bigramCounts(docs, idCol, textCol, minPairCount)
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        d6(lit(2.0) * (xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
          - xlx(col("c_x")) - xlx(col("n_bigrams") - col("c_x"))
          - xlx(col("c_y")) - xlx(col("n_bigrams") - col("c_y"))
          + xlx(col("n_bigrams")))).as("llr"))
  }

  /** Chi-squared association between token presence (distinct per doc)
    * and a boolean document class. For each token with document
    * frequency ≥ minDf: (token, n_pos, n_neg, chi2, pos_assoc) from
    * the 2×2 table [a=pos docs with, b=neg docs with, c/d = without].
    * χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) in decimal(38,0) until the
    * final division — no overflow at any corpus size that fits counts
    * in longs.
    */
  def chi2TokenClass(docs: DataFrame, idCol: String, textCol: String,
      classCol: Column, minDf: Long): DataFrame = {
    val tagged = docs.select(col(idCol).as("id"), classCol.as("pos"),
      col(textCol).as("text"))
    val totals = tagged.agg(
      sum(col("pos").cast("long")).as("np"),
      sum((!col("pos")).cast("long")).as("nn"))
    val tokenDocs = tagged
      .select(col("id"), col("pos"),
        explode(array_distinct(
          filter(split(lower(col("text")), "[^a-z]+"), w => w =!= ""))).as("w"))
    val counts = tokenDocs.groupBy("w").agg(
      sum(col("pos").cast("long")).as("a"),
      sum((!col("pos")).cast("long")).as("b"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    counts.filter(col("a") + col("b") >= minDf)
      .crossJoin(broadcast(totals))
      .withColumn("c", col("np") - col("a"))
      .withColumn("d", col("nn") - col("b"))
      .withColumn("det", dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c")))
      .select(col("w").as("token"), col("a").as("n_pos"), col("b").as("n_neg"),
        // a token present in EVERY doc has an empty "without" column —
        // association is undefined there, surfaced as null not a crash
        when(col("c") + col("d") > 0,
          d6((dec(col("np") + col("nn")) * col("det") * col("det")).cast("double") /
            (dec(col("a") + col("b")) * dec(col("c") + col("d")) *
              dec(col("np")) * dec(col("nn"))).cast("double"))).as("chi2"),
        (dec(col("a")) * dec(col("nn")) >
          dec(col("b")) * dec(col("np"))).cast("long").as("pos_assoc"))
  }
}
