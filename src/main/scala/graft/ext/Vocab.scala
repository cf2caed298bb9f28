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

  /** word2vec-style negative-sampling table: the top-V vocabulary with
    * unigram^power probabilities (Mikolov et al. 2013's 3/4 smoothing)
    * and the cumulative distribution a sampler binary-searches.
    * Output, highest-count first: (term, n_occ, p, cum_p).
    *
    * The table is bounded by construction (top-V via the bounded-heap
    * limit, no global sort), so the cumulation is a broadcast
    * triangular self-join of V rows on the (n_occ desc, term) order —
    * never a window. Weights are 9-dp-rounded pow results summed as
    * decimals, so cum_p is accumulation-order-proof.
    */
  def negativeSamplingTable(docs: DataFrame, textCol: String,
      topV: Int, power: Double = 0.75): DataFrame = {
    require(topV >= 1 && topV <= 100000, s"topV must be in [1, 1e5]: $topV")
    val w = buildVocab(docs, textCol, topV)
      .withColumn("w",
        round(pow(col("n_occ"), lit(power)), 9).cast("decimal(28,9)"))
    val tot = w.agg(sum("w").as("tot"))
    val other = w.select(col("term").as("t2"), col("n_occ").as("c2"),
      col("w").as("w2"))
    w.join(broadcast(other),
        col("c2") > col("n_occ") ||
          (col("c2") === col("n_occ") && col("t2") <= col("term")))
      .groupBy("term", "n_occ", "w")
      .agg(sum("w2").as("cw"))
      .crossJoin(broadcast(tot))
      .select(col("term"), col("n_occ"),
        round(col("w").cast("double") / col("tot").cast("double"), 6)
          .as("p"),
        round(col("cw").cast("double") / col("tot").cast("double"), 6)
          .as("cum_p"))
  }

  /** Vocabulary coverage curve: for each candidate vocabulary size in
    * `sizes`, the fraction of all token OCCURRENCES a top-k-by-
    * frequency vocabulary would cover — the tokenizer-budget question
    * ("does 32k vocab cover 95% or 99% of this corpus") answered in
    * one pass. Output per size: (vocab_size, k_actual, n_types,
    * covered, total, coverage), k_actual = min(size, n_types).
    *
    * ONE token-keyed aggregate, then frequency-rank and cumulative
    * occurrence mass ride a single chunked [[graft.ops.PrefixSum]]
    * scan over the (negated-count, term) order — no unpartitioned
    * window, no per-size rescan of the corpus. Ranks and sums are
    * exact longs; ties break lexicographically so the curve is
    * engine-deterministic. (Frequency spectra are Zipf-skewed, so the
    * low-count chunks hold most TYPES — acceptable because the scan
    * runs over the vocabulary, which is orders of magnitude smaller
    * than the corpus.)
    */
  def coverageCurve(docs: DataFrame, textCol: String,
      sizes: Seq[Int], chunkSpan: Long = 16L): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      s"sizes must be positive: $sizes")
    // vocabulary-sized, read by BOTH the chunked scan and the totals
    // aggregate — materialized once so the corpus token agg is not
    // re-derived per reference (r10; graft.ops.Materialize doc)
    val counts = graft.ops.Materialize.bounded(docs
      .select(explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_occ"))
      .withColumn("neg", -col("n_occ"))
      .withColumn("one", lit(1L)))
    val scanned = graft.ops.PrefixSum.runningTotals(counts, "neg",
        Seq("n_occ" -> "cum_before", "one" -> "rank_before"), chunkSpan,
        tieBreak = Seq("term"))
      .withColumn("rank", col("rank_before") + 1L)
      .withColumn("cum", col("cum_before") + col("n_occ"))
    val totals = counts.agg(sum("n_occ").as("total"),
      count(lit(1)).as("n_types"))
    val sizesDf = docs.sparkSession
      .createDataFrame(sizes.map(s => Tuple1(s.toLong))).toDF("vocab_size")
    scanned.crossJoin(broadcast(totals))
      .join(broadcast(sizesDf),
        col("rank") === least(col("vocab_size"), col("n_types")))
      .select(col("vocab_size"), col("rank").as("k_actual"),
        col("n_types"), col("cum").as("covered"), col("total"),
        round(col("cum").cast("double") / col("total"), 6).as("coverage"))
  }

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
