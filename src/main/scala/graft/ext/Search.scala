package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over a document corpus: BM25-scored top-k search
  * against a (small) set of keyword queries — the retrieval primitive a
  * training-data pipeline uses for targeted corpus probes (eval-set
  * leakage hunts, topic coverage audits, seed-set expansion).
  *
  * Scale shape, in order of what matters at 100 TB:
  *   - The corpus text NEVER shuffles. Tokens are exploded map-side and
  *     immediately semi-joined (broadcast) against the query vocabulary,
  *     so only (doc_id, query-term, tf) postings — a few rows per doc —
  *     reach the aggregation shuffle. A 100 TB corpus with a 20-term
  *     query set shuffles ~20 longs per document, not the text.
  *   - Document length and corpus stats (N, avgdl) reduce to a
  *     single-row broadcast; no join against a per-doc table.
  *   - Per-query ranking goes through the row_number()-over-window
  *     form that [[graft.functions.GraftExtensions]] rewrites to the
  *     bounded-heap TopKPerKey plan — no global sort of scores.
  *
  * Scoring follows the Lucene/Okapi BM25 variant with the +1 inside the
  * idf log so idf is always positive:
  *   idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
  *   s(q, d) = sum over t in q of idf(t) * tf * (k1+1)
  *             / (tf + k1 * (1 - b + b * dl/avgdl))
  * Per-term contributions are rounded to 7 decimals and the summed
  * score to 4 before ranking, so the DuckDB oracle's sum order cannot
  * flip a rank (ties then break on doc id).
  */
object Search {

  /** BM25 top-k retrieval. `docs`: corpus with `idCol` and `textCol`;
    * `queryTerms`: a SMALL (broadcastable) frame of (query_id, term)
    * rows — one row per keyword occurrence of each query. Output:
    * (query_id, doc_id, rank, score), `k` rows per query at most.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = docs.select(
      col(idCol).as("doc_id"), TextStats.tokens(col(textCol)).as("words"))
    // Single-row corpus stats: broadcast, never a per-doc join. dl is
    // integral so the avg is order-independent (exact long sum).
    val stats = base
      .select(size(col("words")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    // Postings restricted to the query vocabulary BEFORE any shuffle:
    // the broadcast semi-join runs map-side against the exploded tokens,
    // so corpus text and non-query terms never leave the scan stage.
    val qvocab = queryTerms.select("term").distinct()
    val postings = base
      .select(col("doc_id"), size(col("words")).cast("double").as("dl"),
        explode(col("words")).as("term"))
      .join(broadcast(qvocab), "term")
    // dl is constant per doc, so folding it into the grouping key costs
    // nothing and keeps the aggregate deterministic.
    val tf = postings.groupBy("doc_id", "term", "dl")
      .agg(count(lit(1)).as("tf"))
    // Document frequency as a term-partitioned window over tf, NOT a
    // second aggregate: a separate dfreq frame re-plans (and re-scans)
    // the whole postings subtree — Catalyst's exchange reuse does not
    // catch it — while the window reuses the materialized tf rows, all
    // of which are already restricted to the query vocabulary.
    val tfd = tf.withColumn("df_t",
      count(lit(1)).over(Window.partitionBy("term")))
    val contrib = tfd
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1.0))
      .withColumn("c", round(
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + col("dl") / col("avgdl") * b)), 7))
    val scores = contrib
      .join(broadcast(queryTerms), "term")
      .groupBy("query_id", "doc_id")
      .agg(round(sum("c"), 4).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Coordination-level ranking: documents ranked by how many DISTINCT
    * terms of the query they contain — the cheap first-pass scorer a
    * hybrid retrieval stack pairs with BM25 (and the second voice RRF
    * needs). Same scale shape as [[bm25TopK]]: tokens are restricted to
    * the query vocabulary map-side, so only (doc, matched-term) rows —
    * not text — reach the shuffle. Ties break on doc id; ranking runs
    * through the bounded-heap top-k rewrite, no global sort.
    */
  def termOverlapTopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qt = queryTerms.select("query_id", "term").distinct()
    val matched = docs
      .select(col(idCol).as("doc_id"),
        explode(TextStats.tokens(col(textCol))).as("term"))
      .join(broadcast(qt.select("term").distinct()), "term")
      .distinct()
    val scores = matched
      .join(broadcast(qt), "term")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_matched").desc, col("doc_id"))
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("n_matched"))
  }

  /** Reciprocal-rank fusion [Cormack, Clarke & Buettcher, SIGIR 2009]:
    * merge several per-query rankings into one by
    *
    *   rrf(q, d) = Σ over rankings r that retrieved d of 1/(k0 + rank_r)
    *
    * — the standard way hybrid search combines BM25 with a dense
    * (embedding) ranking without calibrating their incomparable scores.
    * Each input needs (query_id, doc_id, rank) columns; k0 = 60 is the
    * paper's constant.
    *
    * Scale shape: inputs are already top-k-per-query (bounded — k rows
    * per query each), so the union + one keyed partial agg touches
    * O(queries·k·lists) rows regardless of corpus size; the re-ranking
    * window runs through the bounded-heap top-k rewrite. Per-list
    * reciprocal terms are rounded to 10 and summed as DECIMAL so the
    * fused score is independent of list arrival order; final rank ties
    * break on doc id.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    val unioned = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = unioned
      .groupBy("query_id", "doc_id")
      .agg(
        count(lit(1)).as("n_lists"),
        sum(round(lit(1.0) / (lit(k0) + col("rank")), 10)
          .cast("decimal(28,12)")).as("__s"))
      .withColumn("rrf_score", round(col("__s").cast("double"), 8))
      .drop("__s")
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), col("rrf_score"),
        col("n_lists"))
  }
}
