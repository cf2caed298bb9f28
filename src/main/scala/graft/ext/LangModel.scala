package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the perplexity-filter tier
  * of a web-corpus pipeline (CCNet-style: train a small LM on trusted
  * text, keep documents whose average token log-probability is not
  * absurdly low; gibberish, boilerplate soup, and wrong-language text
  * all score far below clean prose).
  *
  * The LM here is deliberately the simplest thing with the right plan
  * shape: add-one-smoothed unigrams from a TRAIN split, scored over the
  * full corpus. Swapping in a KenLM-grade model changes the lookup
  * table's contents, not the plan.
  *
  * Scale shape: training is one (term)-keyed counted shuffle (terms,
  * never text); scoring explodes tokens and joins the LM table —
  * broadcast here (tiny vocab), a shuffle join at real vocab sizes
  * (same declared trade as TF-IDF's df join). Per-term log-probs round
  * to 8 dp THEN go decimal for the per-doc sum: ln() may differ in
  * final ulps across engines/libms, and the gate must not hang on an
  * ulp; after rounding, the decimal sum is partitioning- and
  * engine-exact.
  */
object LangModel {

  /** (term, ln_p) with add-one smoothing over the train split's
    * tokens: ln((c+1) / (N + V)).
    */
  def unigramTable(train: DataFrame, textCol: String): DataFrame = {
    val counts = train
      .select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(
      sum(col("c")).as("n_total"), count(lit(1)).as("v_size"))
    counts.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((col("c") + 1).cast("double") / (col("n_total") + col("v_size"))), 8)
          .as("ln_p"),
        col("n_total"), col("v_size"))
  }

  /** Score every document: token count, OOV count vs the train vocab,
    * and average token log-prob (OOV tokens take the smoothing floor
    * ln(1 / (N + V))). The train split must be non-empty — an empty LM
    * has no floor to smooth against.
    *
    * The totals ride a one-row broadcast cross join (NOT the lm rows:
    * an OOV token has no lm row to carry N and V, which is exactly
    * where the floor is needed).
    */
  def scoreUnigram(docs: DataFrame, idCol: String, textCol: String,
      train: DataFrame): DataFrame = {
    val lm = unigramTable(train, textCol)
    val totals = lm.select(col("n_total"), col("v_size")).limit(1)
    val docToks = docs.select(col(idCol),
      explode(TextStats.tokens(col(textCol))).as("term"))
    docToks.join(broadcast(lm.select(col("term"), col("ln_p"))), Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("term_lp",
        coalesce(col("ln_p"),
          round(log(lit(1.0) / (col("n_total") + col("v_size"))), 8)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("ln_p").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(sum(col("term_lp").cast("decimal(28,10)")).cast("double")
          / count(lit(1)), 6).as("avg_logprob"))
  }
}
