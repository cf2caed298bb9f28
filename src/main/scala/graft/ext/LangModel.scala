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

  /** Interpolated-bigram scoring — the shape real perplexity filters
    * take (a unigram LM calls keyword-stuffed spam fluent; the bigram
    * term restores word-ORDER sensitivity):
    *
    *   score(d) = mean over bigram positions (w1, w2) of
    *     ln( λ·p_bi(w2|w1) + (1−λ)·p_uni(w2) )
    *   p_bi = (c(w1 w2) + 1) / (c(w1) + V)      (add-one vs context)
    *   p_uni = (c(w2) + 1) / (N + V)
    *
    * with unseen grams/terms taking c = 0 — the same smoothing floors
    * as [[scoreUnigram]]. Documents with < 2 tokens have no bigram
    * positions and emit no row.
    *
    * Determinism across engines: probabilities are exact-integer-count
    * ratios in double (bit-identical given identical counts), each
    * position's ln is rounded to 8 before a DECIMAL(28,10)-exact sum —
    * addition order cannot move the result — and the mean rounds to 6.
    * λ is passed through and (1−λ) computed in double on BOTH sides,
    * so even the classic 1.0−0.7 representation error agrees.
    *
    * Scale shape: doc bigrams join the bigram table ON THE GRAM KEY as
    * a shuffle join — a 100 TB corpus's bigram table dwarfs executor
    * memory, so it must never broadcast. The unigram counts are
    * VOCABULARY-sized and must not broadcast either (a web-crawl
    * vocabulary is billions of distinct tokens; under the scale
    * harness's caesar replication the vocab grows linearly with
    * replicas, and round 8 measured the broadcast build blowing the
    * scaled leg out 62.9×): instead, every lookup the formula needs
    * (c12 via gram, c1/c2 via w1/w2) lands on the corpus's DISTINCT-
    * gram table — map-side-deduped, type-sized — via shuffle joins,
    * and the position table then joins that finished lookup exactly
    * once on the gram key. Raw positions cross the wire ONCE; every
    * other exchange carries gram/term types or per-doc partials. Only
    * the one-row totals broadcast.
    */
  def scoreBigramInterpolated(
      docs: DataFrame, idCol: String, textCol: String,
      train: DataFrame, lambda: Double): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val uc = train
      .select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = uc.agg(
      sum(col("c")).as("n_total"), count(lit(1)).as("v_size"))
    val bi = train
      .select(explode(TextStats.ngramArray(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val docBi = docs.select(col(idCol).as("id"),
      explode(TextStats.ngramArray(col(textCol), 2)).as("gram"))
    // type-sized lookup: every gram the corpus mentions, with the
    // counts the formula needs attached via shuffle joins
    val gramInfo = docBi.select(col("gram")).distinct()
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(bi.hint("merge"), Seq("gram"), "left")
      .join(uc.select(col("term").as("w1"), col("c").as("c1"))
        .hint("merge"), Seq("w1"), "left")
      .join(uc.select(col("term").as("w2"), col("c").as("c2"))
        .hint("merge"), Seq("w2"), "left")
      .select(col("gram"), col("c12"), col("c1"), col("c2"))
    // gramInfo covers every doc gram by construction -> inner join
    val p = docBi.join(gramInfo.hint("merge"), Seq("gram"))
      .crossJoin(broadcast(totals))
      .withColumn("p_bi",
        (coalesce(col("c12"), lit(0L)) + 1).cast("double")
          / (coalesce(col("c1"), lit(0L)) + col("v_size")))
      .withColumn("p_uni",
        (coalesce(col("c2"), lit(0L)) + 1).cast("double")
          / (col("n_total") + col("v_size")))
      .withColumn("lp",
        round(log(lit(lambda) * col("p_bi") + lit(1.0 - lambda) * col("p_uni")), 8))
    p.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen_bigrams"),
        round(sum(col("lp").cast("decimal(28,10)")).cast("double")
          / count(lit(1)), 6).as("avg_interp_logprob"))
  }

  /** Kneser-Ney-smoothed bigram scoring — the smoothing real LM
    * pipelines use (Chen & Goodman 1999): instead of add-one's uniform
    * mass, an absolute discount `D` is skimmed off every seen bigram
    * and redistributed by CONTINUATION probability — how many distinct
    * contexts a word follows — so "Francisco" (frequent but only ever
    * after "San") stops stealing mass from genuinely versatile words:
    *
    *   P_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *                 + (D·N1+(w1·)/c(w1·)) · N1+(·w2)/N_types
    *
    * where c(w1·) = Σ_w2 c(w1w2) (the bigram-context count — the
    * correct KN denominator, not the raw unigram count), N1+(w1·) =
    * distinct followers of w1, N1+(·w2) = distinct predecessors of w2,
    * N_types = distinct bigram count. Unseen bigrams (c=0) score on
    * pure continuation mass; positions whose w1 was never a context or
    * whose w2 was never a continuation in train have NO defined KN
    * probability and are SKIPPED and counted (`n_skipped`) — the same
    * honest accounting as `n_unseen_bigrams` above. A doc with every
    * position skipped emits a null average, not a crash.
    *
    * Determinism: D defaults to 0.75 — exactly representable in
    * binary — and the probability is integer-count ratio arithmetic
    * spelled in the SAME operation order as the oracle; per-position
    * ln rounds to 8, DECIMAL(28,10)-exact sum, mean rounds to 6.
    *
    * Scale shape: identical to [[scoreBigramInterpolated]] — the gram
    * join shuffles on the gram key (a 100 TB bigram table never
    * broadcasts), and the vocabulary-sized ctx/cont tables never
    * broadcast either (round 8's scale bug: the vocab grows linearly
    * under replication and without bound on a web crawl). All lookups
    * (c12, ctx's c1/n_follow, cont's n_prec) land on the corpus's
    * distinct-gram table via type-sized shuffle joins; raw positions
    * shuffle exactly once, onto that finished lookup. Only the scalar
    * `types` broadcasts.
    */
  def scoreBigramKneserNey(
      docs: DataFrame, idCol: String, textCol: String,
      train: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1): $discount")
    val bi = train
      .select(explode(TextStats.ngramArray(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n_follow"))
    val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("n_prec"))
    val types = bi.agg(count(lit(1)).as("n_types"))
    val docBi = docs.select(col(idCol).as("id"),
      explode(TextStats.ngramArray(col(textCol), 2)).as("gram"))
    // type-sized lookup over the corpus's distinct grams
    val gramInfo = docBi.select(col("gram")).distinct()
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(bi.select(col("gram"), col("c12")).hint("merge"),
        Seq("gram"), "left")
      .join(ctx.hint("merge"), Seq("w1"), "left")
      .join(cont.hint("merge"), Seq("w2"), "left")
      .select(col("gram"), col("c12"),
        col("c1"), col("n_follow"), col("n_prec"))
    val p = docBi.join(gramInfo.hint("merge"), Seq("gram"))
      .crossJoin(broadcast(types))
      .withColumn("skipped",
        (col("c1").isNull || col("n_prec").isNull).cast("int"))
      .withColumn("lp", when(col("skipped") === 1, lit(null))
        .otherwise(round(log(
          greatest(coalesce(col("c12"), lit(0L)).cast("double")
            - lit(discount), lit(0.0)) / col("c1")
          + ((lit(discount) * col("n_follow")) / col("c1"))
            * (col("n_prec").cast("double") / col("n_types"))), 8)))
    val scored = count(lit(1)) - sum(col("skipped").cast("long"))
    p.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("skipped").cast("long")).as("n_skipped"),
        round(sum(col("lp").cast("decimal(28,10)")).cast("double")
          / when(scored === 0, lit(null)).otherwise(scored), 6)
          .as("avg_kn_logprob"))
  }
}
