package graft.ext

import graft.SparkTestBase

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("embeddingDrift: shifted batch reports the exact mean shift") {
    val base = Seq(Seq(1.0f, 0.0f), Seq(3.0f, 0.0f)).map(Tuple1(_))
      .toDF("vec")
    val batch = Seq(Seq(2.0f, 5.0f), Seq(4.0f, 5.0f)).map(Tuple1(_))
      .toDF("vec")
    val rows = Drift.embeddingDrift(base, batch, "vec")
      .collect().map(r => r.getAs[Long]("dim") -> r).toMap
    assert(rows(0L).getAs[Double]("mean_base") === 2.0)
    assert(rows(0L).getAs[Double]("mean_batch") === 3.0)
    assert(rows(0L).getAs[Double]("mean_shift") === 1.0)
    assert(rows(0L).getAs[Double]("var_base") === 1.0)
    assert(rows(1L).getAs[Double]("mean_shift") === 5.0)
    assert(rows(1L).getAs[Double]("var_batch") === 0.0)
  }

  test("cosineHistogram: collapsed space piles all pairs in the top bin") {
    // identical directions -> every pairwise cosine is 1.0 -> bin 19
    val df = (1L to 30L).map(i => (i, Seq(1.0f, 1.0f))).toDF("id", "vec")
    val rows = Drift.cosineHistogram(df, "id", "vec", maxSample = 64)
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("bin") === 19L)
    assert(rows.head.getAs[Long]("n_pairs") === 30L * 29L / 2L)
    assert(rows.head.getAs[Double]("mean_cos") === 1.0)
  }

  test("cosineHistogram: orthogonal/opposite directions land in their bins") {
    // +x vs -x: cos(-1) -> bin 0; +x vs +y: cos 0 -> bin 10
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("id", "vec")
    val rows = Drift.cosineHistogram(df, "id", "vec", maxSample = 64)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(rows === Map(0L -> 1L, 10L -> 2L))
  }

  test("psi: identical distributions score 0, a hard shift scores large") {
    val a = (1 to 100).map(i => Tuple1(i % 10 / 10.0)).toDF("v")
    val same = Drift.psi(a, a, "v", lo = 0.0, hi = 1.0, bins = 10)
      .collect().head
    assert(same.getAs[Long]("n_a") === 100L && same.getAs[Long]("n_b") === 100L)
    assert(same.getAs[Double]("psi") === 0.0)
    // all mass moved to the top half: industry rule-of-thumb "investigate"
    val b = (1 to 100).map(i => Tuple1(0.5 + i % 5 / 10.0)).toDF("v")
    val shift = Drift.psi(a, b, "v", lo = 0.0, hi = 1.0, bins = 10)
      .collect().head
    assert(shift.getAs[Double]("psi") > 0.2)
  }

  test("psi: symmetric in sign — psi(a,b) == psi(b,a)") {
    val a = (1 to 60).map(i => Tuple1(i % 7 / 7.0)).toDF("v")
    val b = (1 to 90).map(i => Tuple1(i % 4 / 4.0)).toDF("v")
    val ab = Drift.psi(a, b, "v", 0.0, 1.0, 10).collect().head.getAs[Double]("psi")
    val ba = Drift.psi(b, a, "v", 0.0, 1.0, 10).collect().head.getAs[Double]("psi")
    // algebraically symmetric; FP reciprocal logs can differ in the
    // final rounded digit, so compare at the metric's own precision
    assert(math.abs(ab - ba) <= 2e-6)
    assert(ab > 0.0)
  }

  test("cosineHistogram: the md5 sample is an absolute, deterministic budget") {
    val df = (1L to 200L).map(i => (i, Seq(i.toFloat, 1.0f))).toDF("id", "vec")
    val a = Drift.cosineHistogram(df, "id", "vec", maxSample = 40)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    val b = Drift.cosineHistogram(df, "id", "vec", maxSample = 40)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(a === b, "same salt + budget must sample identically")
    // pair work is EXACTLY the budget's triangle, independent of n
    assert(a === 40L * 39L / 2L, "sample must be exactly maxSample rows")
    val c = Drift.cosineHistogram(df.union(df.selectExpr("id + 1000 AS id", "vec")),
        "id", "vec", maxSample = 40)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(c === 40L * 39L / 2L, "pair work must not grow with the corpus")
  }
}
