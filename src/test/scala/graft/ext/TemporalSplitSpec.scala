package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TemporalSplitSpec extends SparkTestBase {

  import spark.implicits._

  // 5 days x 2 rows; 3/5 target -> cutoff lands exactly on day 3.
  private def fixture = (0 until 10)
    .map(i => (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${i / 2 + 1} 12:00:0${i % 2}")))
    .toDF("id", "ts")

  test("cuts at the smallest day boundary reaching the train fraction") {
    val out = TemporalSplit.temporalSplit(fixture, "ts", 3L, 5L)
    val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit === Map("train" -> 6L, "eval" -> 4L))
    // causality: every train row precedes every eval row
    val maxTrain = out.filter($"split" === "train").agg(max($"ts")).head().getTimestamp(0)
    val minEval = out.filter($"split" === "eval").agg(min($"ts")).head().getTimestamp(0)
    assert(maxTrain.before(minEval))
  }

  test("train fraction is a floor guarantee: train count >= n*num/den") {
    // skewed days: 1 row day1, 7 rows day2, 2 rows day3; 1/2 target ->
    // day2 is the smallest boundary with cum*2 >= 10 (8 rows)
    val df = ((1 to 1).map(i => ("2024-02-01 00:00:00", i)) ++
      (1 to 7).map(i => ("2024-02-02 00:00:00", i)) ++
      (1 to 2).map(i => ("2024-02-03 00:00:00", i)))
      .map { case (t, i) => (i.toLong, java.sql.Timestamp.valueOf(t)) }
      .toDF("id", "ts")
    val n = TemporalSplit.temporalSplit(df, "ts", 1L, 2L)
      .filter($"split" === "train").count()
    assert(n === 8L)
  }

  test("property: floor guarantee and causality for random day distributions") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val rowsGen = Gen.listOfN(200, Gen.zip(
      Gen.choose(1, 20), Gen.choose(0, 86399))) // (day-of-month, sec-of-day)
    (1 to 3).foreach { i =>
      val rows = sample(rowsGen, 500L + i).zipWithIndex.map { case ((d, s), j) =>
        (j.toLong, java.sql.Timestamp.valueOf(
          f"2024-03-$d%02d ${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d"))
      }
      val out = TemporalSplit.temporalSplit(rows.toDF("id", "ts"), "ts", 7L, 10L)
      val n = rows.size.toLong
      val train = out.filter($"split" === "train")
      assert(train.count() * 10L >= n * 7L, "train fraction below target")
      // causality: train owns the whole boundary day, eval starts on a
      // strictly later day, so every eval row follows every train row
      val maxTrain = train.agg(max($"ts")).head().getTimestamp(0)
      val evalRows = out.filter($"split" === "eval")
      if (evalRows.count() > 0) {
        val minEval = evalRows.agg(min($"ts")).head().getTimestamp(0)
        assert(minEval.after(maxTrain), "eval row precedes last train row")
      }
    }
  }

  test("fraction preconditions fail fast") {
    intercept[IllegalArgumentException](
      TemporalSplit.temporalSplit(fixture, "ts", 6L, 5L))
    intercept[IllegalArgumentException](
      TemporalSplit.temporalSplit(fixture, "ts", 1L, 0L))
  }
}
