package graft.ext

import graft.SparkTestBase

class ReliabilitySpec extends SparkTestBase {
  import spark.implicits._

  test("bins, counts, exact means and rates on a hand table") {
    val df = Seq(
      (0.05, false), (0.08, false),          // bin 0: rate 0
      (0.55, true), (0.52, false),           // bin 5: rate 0.5
      (0.95, true), (0.99, true), (1.0, true) // bin 9 (1.0 folds in): rate 1
    ).toDF("score", "good")
    val rows = Reliability.curve(df, "score", "good")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === Set(0L, 5L, 9L))
    assert(rows(0L).getLong(1) === 2 && rows(0L).getDouble(3) === 0.0)
    assert(rows(5L).getLong(1) === 2 && rows(5L).getDouble(3) === 0.5)
    assert(rows(9L).getLong(1) === 3 && rows(9L).getDouble(3) === 1.0)
    assert(rows(0L).getDouble(2) === 0.065)
    assert(rows(9L).getDouble(2) === 0.98)
  }

  test("ece: perfectly calibrated scores 0, a fixed gap scores the gap") {
    // every bin's pos_rate equals its mean_score -> ECE 0
    val calibrated = (for {
      s <- Seq(0.25, 0.75); i <- 0 until 20
    } yield (s, i < math.round(s * 20).toInt)).toDF("score", "good")
    val z = Reliability.ece(calibrated, "score", "good").collect().head
    assert(z.getAs[Double]("ece") === 0.0)
    // constant score 0.3, true rate 0.5 -> single bin, ECE = 0.2
    val off = (0 until 10).map(i => (0.3, i < 5)).toDF("score", "good")
    val o = Reliability.ece(off, "score", "good").collect().head
    assert(o.getAs[Long]("n") === 10L && o.getAs[Long]("n_bins") === 1L)
    assert(o.getAs[Double]("ece") === 0.2)
  }

  test("a perfectly calibrated scorer tracks pos_rate == mean_score") {
    // score s with exactly round(s*20) positives out of 20 per bucket
    val rows = for {
      s <- Seq(0.25, 0.75)
      i <- 0 until 20
    } yield (s, i < math.round(s * 20).toInt)
    val out = Reliability.curve(rows.toDF("score", "good"), "score", "good")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    out.foreach { case (m, p) => assert(m === p) }
  }
}
