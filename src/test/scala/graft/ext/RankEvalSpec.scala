package graft.ext

import graft.SparkTestBase

class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def d6(x: Double): Double =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("auc: hand case with a tie counts the tied pair as 1/2") {
    // pos {0.9, 0.8, 0.5}, neg {0.5, 0.3}: of the 6 pairs, 5 are pos
    // wins and one is a tie -> U = 5.5, AUC = 5.5/6.
    val df = Seq((0.9, true), (0.8, true), (0.5, true),
      (0.5, false), (0.3, false)).toDF("score", "good")
    val r = RankEval.auc(df, "score", "good").collect().head
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === d6(5.5 / 6.0))
    assert(r.getAs[Double]("gini") === d6(5.5 / 6.0 * 2.0 - 1.0))
  }

  test("auc: perfect separation is 1, reversal is 0") {
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "good")
    assert(RankEval.auc(sep, "score", "good")
      .collect().head.getAs[Double]("auc") === 1.0)
    val rev = Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false))
      .toDF("score", "good")
    assert(RankEval.auc(rev, "score", "good")
      .collect().head.getAs[Double]("auc") === 0.0)
  }

  test("auc is chunk-span invariant (the scan, not the chunking, decides)") {
    val df = (1 to 200).map(i =>
      (i / 200.0, (i * 2654435761L % 97) < 40)).toDF("score", "good")
    val a1 = RankEval.auc(df, "score", "good", chunkSpan = 65536L)
      .collect().head.getAs[Double]("auc")
    val a2 = RankEval.auc(df, "score", "good", chunkSpan = 1000L)
      .collect().head.getAs[Double]("auc")
    assert(a1 === a2)
  }

  test("liftTable: counts, rates and top-down cumulation on two bins") {
    val df = (Seq.fill(1)(true) ++ Seq.fill(3)(false)).map((0.2, _)) ++
      (Seq.fill(3)(true) ++ Seq.fill(1)(false)).map((0.8, _))
    val rows = RankEval.liftTable(df.toDF("score", "good"), "score", "good",
        bins = 2)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    val top = rows(1L)
    assert(top.getAs[Long]("n") === 4 && top.getAs[Long]("pos") === 3)
    assert(top.getAs[Double]("pos_rate") === 0.75)
    assert(top.getAs[Double]("lift") === 1.5)
    assert(top.getAs[Long]("cum_n") === 4 && top.getAs[Long]("cum_pos") === 3)
    assert(top.getAs[Double]("cum_gain") === 0.75)
    assert(top.getAs[Double]("cum_lift") === 1.5)
    val bot = rows(0L)
    assert(bot.getAs[Double]("pos_rate") === 0.25)
    assert(bot.getAs[Long]("cum_n") === 8 && bot.getAs[Long]("cum_pos") === 4)
    assert(bot.getAs[Double]("cum_gain") === 1.0)
    assert(bot.getAs[Double]("cum_lift") === 1.0)
  }

  test("dcg weights: literal values and prefix sums") {
    val w = RankEval.dcgWeights(3).map(_.doubleValue)
    assert(w(0) === 1.0)
    assert(w(1) === 0.630929754)   // 1/log2(3) to 9 dp
    assert(w(2) === 0.5)
    val p = RankEval.idcgPrefix(3).map(_.doubleValue)
    assert(p(0) === 1.0 && p(2) === 2.130929754)
    assert(RankEval.dcgWeightsSqlRows(2) ===
      "(1, 1.000000000, 1.000000000), (2, 0.630929754, 1.630929754)")
  }

  test("retrievalMetrics: k beyond the list length still scores correctly") {
    // only 2 results ranked, k=10: p@k divides by k, dcg uses actual
    // ranks, idcg clamps at min(n_rel, k)
    val ranked = Seq(("q", "d1", 1L), ("q", "d2", 2L))
      .toDF("query_id", "doc_id", "rank")
    val rel = Seq(("q", "d1"), ("q", "d2"), ("q", "d3"))
      .toDF("query_id", "doc_id")
    val r = RankEval.retrievalMetrics(ranked, rel, 10).collect().head
    assert(r.getAs[Long]("hits") === 2L)
    assert(r.getAs[Double]("p_at_k") === 0.2)
    assert(r.getAs[Double]("mrr") === 1.0)
    // dcg = w1 + w2; idcg = prefix(3) since n_rel=3 < k
    val w = RankEval.dcgWeights(10).map(_.doubleValue)
    val p = RankEval.idcgPrefix(10).map(_.doubleValue)
    assert(r.getAs[Double]("ndcg") === d6((w(0) + w(1)) / p(2)))
  }

  test("retrievalMetrics: hand ranked list") {
    // q1: relevant {d2, d9}; ranked d1, d2, d3 -> hit at rank 2 only.
    // q2: relevant {d5}; ranked surfaces nothing relevant.
    val ranked = Seq(("q1", "d1", 1L), ("q1", "d2", 2L), ("q1", "d3", 3L),
      ("q2", "d1", 1L)).toDF("query_id", "doc_id", "rank")
    val rel = Seq(("q1", "d2"), ("q1", "d9"), ("q2", "d5"))
      .toDF("query_id", "doc_id")
    val rows = RankEval.retrievalMetrics(ranked, rel, 3)
      .collect().map(r => r.getAs[String]("query_id") -> r).toMap
    val q1 = rows("q1")
    assert(q1.getAs[Long]("n_rel") === 2 && q1.getAs[Long]("hits") === 1)
    assert(q1.getAs[Double]("p_at_k") === d6(1.0 / 3.0))
    assert(q1.getAs[Double]("recall_at_k") === 0.5)
    assert(q1.getAs[Double]("mrr") === 0.5)
    assert(q1.getAs[Double]("ndcg") === d6(0.630929754 / 1.630929754))
    val q2 = rows("q2")
    assert(q2.getAs[Long]("hits") === 0)
    assert(q2.getAs[Double]("mrr") === 0.0)
    assert(q2.getAs[Double]("ndcg") === 0.0)
    assert(q2.getAs[Double]("recall_at_k") === 0.0)
  }
}
