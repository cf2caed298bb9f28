package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — learning the merge table itself, the step
  * upstream of [[graft.functions.Bpe]]'s encode/decode (which consume a
  * fixed table). Classic byte-pair-encoding (Sennrich et al. 2016):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair.
  *
  * Scale shape — the textbook algorithm is a driver loop over a
  * dictionary, and the distributed version keeps exactly that split:
  *
  *  1. ONE pass over the corpus reduces it to the (distinct word,
  *     count) dictionary — vocabulary-sized, not corpus-sized; this is
  *     the only stage that ever touches the data, and it is a single
  *     partial-aggregated shuffle on the word.
  *  2. Each of the `k` merge rounds is a pair-count aggregate over the
  *     DICTIONARY (symbol-pair explode → sum of word counts) plus a
  *     1-row argmax collected to the driver — the same
  *     bounded-iteration shape as the Lloyd/IVF trainer and PageRank:
  *     k jobs, each shuffling pair keys (≤ |vocab|·avg_len rows), never
  *     text.
  *  3. The chosen merge is applied to the dictionary as a codegen'd
  *     string replace on the space-joined symbol state (` l r ` →
  *     ` lr ` with sentinel padding — non-overlapping left-to-right,
  *     exactly BPE's greedy application order, and exactly what any
  *     engine's `replace` computes, which is how the oracle replays it).
  *
  * The dictionary is checkpointed per round via localCheckpoint to cut
  * the lineage (k chained replaces would otherwise recompute the whole
  * chain each round).
  *
  * Determinism contract: frequency ties break on (left, right)
  * lexicographic order — merges are a pure function of the corpus, not
  * of partitioning.
  */
object BpeLearn {

  /** The (distinct word, count) dictionary with each word's symbol
    * state initialized to space-joined characters. Lowercased,
    * non-letters are word boundaries.
    */
  def dictionary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .select(array_join(split(col("w"), ""), " ").as("s"), col("c"))

  /** Pair-count table for one dictionary state: (l, r, f). */
  def pairCounts(dict: DataFrame): DataFrame = {
    val parts = split(col("s"), " ")
    val zipped = arrays_zip(
      slice(parts, lit(1), size(parts) - 1),
      slice(parts, lit(2), size(parts) - 1))
    dict
      .filter(size(parts) >= 2)
      .select(explode(zipped).as("p"), col("c"))
      .groupBy(col("p.0").as("l"), col("p.1").as("r"))
      .agg(sum(col("c")).as("f"))
  }

  /** Learn `k` merges. Returns (rank, left, right, freq) with rank
    * 1-based in learn order.
    */
  def learnMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need at least one merge, got $k")
    val spark = df.sparkSession
    var dict = dictionary(df, textCol).localCheckpoint()
    val learned = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= k) {
      val best = pairCounts(dict)
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) { rank = k + 1 } // nothing left to merge
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((rank, l, r, f))
        dict = dict
          .withColumn("s",
            expr(s"trim(replace(concat(' ', s, ' '), ' ${l} ${r} ', ' ${l}${r} '))"))
          .localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "left", "right", "freq")
      .select(col("rank").cast("long"), col("left"), col("right"), col("freq"))
  }

  /** Token count per document before vs after applying `merges` (the
    * compression the learned table buys) — the training-evaluation
    * contract without shipping an encoder: tokens(after) = symbols of
    * each word state after replaying the merges in rank order.
    */
  def compression(
      df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val dict = dictionary(df, textCol)
    val after = merges.foldLeft(dict) { case (d, (l, r)) =>
      d.withColumn("s",
        expr(s"trim(replace(concat(' ', s, ' '), ' ${l} ${r} ', ' ${l}${r} '))"))
    }
    after.agg(
      sum(col("c")).as("n_words"),
      sum(size(split(col("s"), " ")) * col("c")).as("tokens_after"),
      sum(length(regexp_replace(col("s"), " ", "")) * col("c")).as("tokens_before"))
  }
}
