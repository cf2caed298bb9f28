package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the QA gate for human-labeled
  * preference/reward data (the upstream of [[Ranking.bradleyTerry]]):
  * before fitting strengths to pairwise votes, measure whether the
  * raters agree ABOVE CHANCE at all. Cohen's kappa (Cohen 1960)
  * corrects raw agreement for the agreement two independent raters
  * with the same marginals would produce:
  *
  *   κ = (p_o − p_e) / (1 − p_e),
  *   p_o = Σ_c n_cc / n,   p_e = Σ_c (rowMarg_c · colMarg_c) / n².
  *
  * Scale shape: ONE data-bearing shuffle — the (label_a, label_b)
  * confusion-cell count, bounded by categories², not rows. Marginals,
  * agreement and the κ algebra all fold over that bounded cell table.
  *
  * Exactness: every input to the algebra is an exact integer count
  * (the marginal product is summed in DECIMAL so 10¹²-row marginals
  * cannot overflow a long); the three double divisions are spelled
  * identically in the oracle, so κ is bit-equal cross-engine.
  */
object Agreement {

  /** One row: (n, n_agree, po, pe, kappa), 6-dp rounded ratios; κ is
    * null when p_e = 1 (both raters constant — agreement is vacuous,
    * not perfect).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("c"))
    val totals = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("la") === col("lb"), col("c")).otherwise(0L)).as("n_agree"))
    val margA = cells.groupBy("la").agg(sum(col("c")).as("ca"))
    val margB = cells.groupBy("lb").agg(sum(col("c")).as("cb"))
    val peNum = margA
      .join(margB, col("la") === col("lb"))
      .agg(sum(col("ca").cast("decimal(38,0)") * col("cb")).as("pe_num"))
    val po = col("n_agree").cast("double") / col("n")
    val pe = col("pe_num").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    totals.crossJoin(peNum)
      .select(col("n"), col("n_agree"),
        round(po, 6).as("po"),
        round(pe, 6).as("pe"),
        when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Krippendorff's alpha, nominal metric, two raters, no missing
    * values — the agreement coefficient that generalizes to >2 raters
    * and missingness, so pipelines standardize on it even in the
    * two-rater case. Coincidence formulation (Krippendorff 2004):
    * each unit contributes the ordered pairs (a,b) and (b,a);
    * with o_ck the coincidence counts and n_c its marginals over
    * n = 2·units pairable values,
    *
    *   α = 1 − (n−1)·Σ_{c≠k} o_ck / Σ_{c≠k} n_c·n_k.
    *
    * Same scale shape as [[cohenKappa]]: one coincidence-cell shuffle
    * bounded by categories², then exact-integer algebra (decimal for
    * the marginal products) and one final IEEE division. Output one
    * row: (n_units, n_categories, do_num, de_num, alpha); α is null
    * when every value is one category (no expected disagreement).
    */
  def krippendorffAlpha(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val pairs = df.select(col(aCol).as("c"), col(bCol).as("k"))
      .unionAll(df.select(col(bCol).as("c"), col(aCol).as("k")))
    val cells = pairs.groupBy("c", "k").agg(count(lit(1)).as("o"))
    val marg = cells.groupBy("c").agg(sum(col("o")).as("nc"))
    val doNum = cells.agg(
      sum(when(col("c") =!= col("k"), col("o")).otherwise(0L)).as("do_num"),
      (sum(col("o")) / 2).cast("long").as("n_units"))
    val deNum = marg.as("a").crossJoin(marg.as("b"))
      .agg(
        sum(when(col("a.c") =!= col("b.c"),
          col("a.nc").cast("decimal(38,0)") * col("b.nc")).otherwise(lit(0)))
          .cast("long").as("de_num"),
        count(lit(1)).as("n_cat_sq"))
    doNum.crossJoin(deNum)
      .select(col("n_units"),
        sqrt(col("n_cat_sq")).cast("long").as("n_categories"),
        col("do_num"), col("de_num"),
        when(col("de_num") > 0,
          round(lit(1.0) -
            (lit(2.0) * col("n_units") - 1.0) * col("do_num") /
              col("de_num").cast("double"), 6)).as("alpha"))
  }
}
