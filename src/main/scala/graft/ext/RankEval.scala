package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.PrefixSum

/** Ranking-quality evaluation for the pipeline's learned scorers —
  * the discrimination counterpart of [[Reliability]]'s calibration
  * curve (extension; the reference's model diagnostics end at
  * linregress R², `code/process-cams-solrad-ts.py:214-230` — a
  * training-data pipeline additionally judges its quality filter /
  * reward model / retrieval stack by ROC AUC, decile lift, and
  * NDCG-style list metrics before trusting a threshold).
  *
  * Determinism contract (repo-wide pattern): every metric reduces to
  * integer / decimal sufficient statistics — doubled-average-rank
  * integers for AUC (ties exact to .5), long counts for lift,
  * 9-dp-rounded decimal sums for the DCG log series — so both engines
  * run identical final IEEE expression trees.
  *
  * Scale shape: AUC is a group-by on the score domain (shuffle bounded
  * by distinct scores) + one chunked [[PrefixSum]] scan + a scalar
  * aggregate — no single-partition window. Lift aggregates to `bins`
  * rows then cumulates via a broadcast triangular self-join. Retrieval
  * metrics aggregate per query over k-row ranked lists.
  */
object RankEval {

  private def d6(c: Column): Column = round(c, 6)

  /** ROC AUC of `scoreCol` against boolean `labelCol`, exact under
    * ties (tied pairs count 1/2 — the Mann-Whitney equivalence).
    * One row: (n_pos, n_neg, auc, gini).
    *
    * AUC = U⁺/(n⁺·n⁻) with U⁺ from rank sums on the doubled-integer
    * scale: a score value with strict-prefix count p and tie count t
    * contributes cp·(2p + t + 1) — exact in decimal(38,0); the single
    * division to doubles happens once at the end.
    *
    * Scores must be exact multiples of 1e-6 (the repo's 6-dp score
    * contract, e.g. [[QualityModel.hashedLinearScore]]): the prefix
    * scan orders on the exact micro-score INTEGER so [[PrefixSum]]'s
    * chunking spreads the [0,1] domain over `1e6/chunkSpan` chunks
    * instead of collapsing a fractional domain into one.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
      chunkSpan: Long = 65536L): DataFrame = {
    val perValue = df
      .select(
        round(col(scoreCol) * 1e6).cast("long").as("v"),
        when(col(labelCol), 1).otherwise(0).as("pos"))
      .groupBy("v")
      .agg(sum("pos").as("cp"), (count(lit(1)) - sum("pos")).as("cn"))
      .withColumn("t", col("cp") + col("cn"))
    val scanned = PrefixSum.runningTotal(perValue, "v", "t", "p", chunkSpan)
    scanned
      .agg(
        sum("cp").as("n_pos"), sum("cn").as("n_neg"),
        sum(col("cp").cast("decimal(38,0)") *
          (lit(2) * col("p") + col("t") + lit(1))).as("r2p"))
      .select(col("n_pos"), col("n_neg"),
        // U⁺ = R⁺ − n⁺(n⁺+1)/2, halved once off the doubled scale.
        ((col("r2p") - col("n_pos").cast("decimal(38,0)") *
          (col("n_pos") + lit(1))).cast("double") / 2.0 /
          (col("n_pos").cast("double") * col("n_neg"))).as("_auc"))
      .select(col("n_pos"), col("n_neg"), d6(col("_auc")).as("auc"),
        d6(col("_auc") * 2.0 - 1.0).as("gini"))
  }

  /** Decile lift / cumulative-gains table over fixed-width score bins
    * (scores in [0,1]; top edge folds into the last bin). Per bin,
    * highest first: (bin, n, pos, pos_rate, lift, cum_n, cum_pos,
    * cum_gain, cum_lift). `cum_*` accumulate from the TOP bin down —
    * "target the best 20% of the corpus, capture cum_gain of the good
    * docs".
    *
    * Everything is long counts until the final divisions; the
    * cumulation is a triangular self-join of the `bins`-row aggregate
    * (both sides broadcast-sized), never a window over data.
    */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val perBin = df
      .select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("long")
          .as("bin"),
        when(col(labelCol), 1L).otherwise(0L).as("_pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_pos").as("pos"))
    val totals = perBin.agg(
      sum("n").as("t_n"), sum("pos").as("t_pos"))
    val cum = perBin.select(col("bin").as("b2"), col("n").as("n2"),
      col("pos").as("p2"))
    perBin
      .join(broadcast(cum), col("b2") >= col("bin"))
      .groupBy("bin", "n", "pos")
      .agg(sum("n2").as("cum_n"), sum("p2").as("cum_pos"))
      .crossJoin(broadcast(totals))
      .select(
        col("bin"), col("n"), col("pos"),
        d6(col("pos").cast("double") / col("n")).as("pos_rate"),
        d6((col("pos").cast("double") / col("n")) /
          (col("t_pos").cast("double") / col("t_n"))).as("lift"),
        col("cum_n"), col("cum_pos"),
        d6(col("cum_pos").cast("double") / col("t_pos")).as("cum_gain"),
        d6((col("cum_pos").cast("double") / col("cum_n")) /
          (col("t_pos").cast("double") / col("t_n"))).as("cum_lift"))
  }

  /** The DCG rank discounts 1/log2(i+1), i = 1..k, as 9-dp decimal
    * STRINGS computed once here — the operator and the oracle both
    * cast these identical literals, so neither engine evaluates a
    * logarithm (libm `ln` may differ in the last ulp across engines;
    * a shared literal cannot — the EWMA weight-literal pattern).
    */
  private[graft] def dcgWeights(k: Int): Seq[java.math.BigDecimal] =
    (1 to k).map { i =>
      new java.math.BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(9, java.math.RoundingMode.HALF_UP)
    }

  /** Prefix sums of [[dcgWeights]] — IDCG of an ideal list with i
    * relevant docs is element i.
    */
  private[graft] def idcgPrefix(k: Int): Seq[java.math.BigDecimal] =
    dcgWeights(k).scanLeft(java.math.BigDecimal.ZERO)(_.add(_)).tail

  /** `(i, w, p)` rows for a SQL VALUES table of the shared DCG
    * discount and IDCG-prefix literals.
    */
  def dcgWeightsSqlRows(k: Int): String =
    dcgWeights(k).zip(idcgPrefix(k)).zipWithIndex.map {
      case ((w, p), i) => s"(${i + 1}, ${w.toPlainString}, ${p.toPlainString})"
    }.mkString(", ")

  /** List-wise retrieval metrics at cutoff `k` for a ranked run
    * against a binary relevance set.
    *
    * `ranked`: (query_id, doc_id, rank) with rank 1-based ≤ k (e.g.
    * [[Search.bm25TopK]] output). `relevant`: (query_id, doc_id)
    * pairs — the full relevance judgments, also providing recall's
    * denominator. Per query: (query_id, n_rel, hits, p_at_k,
    * recall_at_k, mrr, ndcg).
    *
    * The DCG series Σ rel_i/log2(i+1) sums the shared
    * [[dcgWeights]] decimal literals (exact, order-independent);
    * IDCG is one [[idcgPrefix]] lookup at min(n_rel, k) — no explode,
    * no log evaluation. Queries whose ranked list surfaced no
    * relevant doc get mrr 0 and ndcg 0.
    */
  def retrievalMetrics(ranked: DataFrame, relevant: DataFrame,
      k: Int): DataFrame = {
    require(k > 0 && k <= 10000, s"k must be in [1, 10000], got $k")
    val wLit = typedlit(dcgWeights(k).map(_.toPlainString))
    val pLit = typedlit(idcgPrefix(k).map(_.toPlainString))
    def dec(c: Column): Column = c.cast("decimal(28,9)")
    val nRel = relevant.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"))
    val hitsPerQuery = ranked
      .join(relevant.withColumn("_rel", lit(1L)),
        Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        sum(coalesce(col("_rel"), lit(0L))).as("hits"),
        min(when(col("_rel").isNotNull, col("rank"))).as("first_rel"),
        sum(when(col("_rel").isNotNull,
          dec(element_at(wLit, col("rank").cast("int"))))
          .otherwise(dec(lit(0)))).as("dcg"))
    nRel
      .join(hitsPerQuery, Seq("query_id"), "left")
      .withColumn("idcg",
        dec(element_at(pLit, least(col("n_rel"), lit(k)).cast("int"))))
      .select(
        col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        d6(coalesce(col("hits"), lit(0L)).cast("double") / k).as("p_at_k"),
        d6(coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel"))
          .as("recall_at_k"),
        d6(coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)))
          .as("mrr"),
        d6(coalesce(col("dcg"), dec(lit(0))).cast("double") /
          col("idcg").cast("double")).as("ndcg"))
  }
}
