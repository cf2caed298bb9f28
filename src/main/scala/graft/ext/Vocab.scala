package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-prep operators: corpus vocabulary construction and
  * out-of-vocabulary rates — the coverage measurements run before
  * freezing a tokenizer or filtering a corpus against one.
  *
  * Scale shape: [[buildVocab]] is explode → partially-aggregated
  * groupBy(term) → global bounded top-k, which Catalyst plans as
  * TakeOrderedAndProject (k rows per partition cross the wire, no full
  * sort shuffle). [[oovStats]] broadcasts the vocabulary (top-V is
  * driver-bounded by construction) under the exploded token stream and
  * partially aggregates back to one row per document — token rows never
  * shuffle, only per-document partial counts do.
  */
object Vocab {

  /** Top `topV` whitespace terms by total occurrence count:
    * (term, n_occ). Ties break lexicographically so the vocabulary is
    * deterministic across engines and partitionings.
    */
  def buildVocab(docs: DataFrame, textCol: String, topV: Int): DataFrame =
    docs.select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("term")).limit(topV)

  /** Good-Turing corpus coverage report: from the term frequency
    * spectrum, the probability mass of UNSEEN vocabulary
    * (p_unseen = n1/N, Good 1953) and the adjusted count for
    * once-seen terms (r1* = 2·n2/n1) — the quick answer to "how much
    * of the language is this corpus still missing", read before
    * deciding whether more crawling beats more epochs.
    *
    * One token-keyed aggregate (map-side combined; only terms
    * shuffle) folded to a single row — the same plan shape at 100 TB.
    */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"))
      .withColumn("p_unseen",
        when(col("n_tokens") > 0,
          round(col("n_hapax").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
      .withColumn("r1_star",
        when(col("n_hapax") > 0,
          round(lit(2.0) * col("n_dis") / col("n_hapax"), 6))
          .otherwise(lit(0.0)))

  /** Per-document coverage against `vocab` (a (term, ...) frame):
    * (idCol, n_tokens, n_oov, oov_rate).
    */
  def oovStats(
      docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame =
    docs.select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .join(broadcast(vocab.select(col("term"), lit(1).as("__in"))), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
}
