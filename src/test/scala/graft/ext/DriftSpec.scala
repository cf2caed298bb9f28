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
    val rows = Drift.cosineHistogram(df, "id", "vec", sampleRate = 1.0)
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
    val rows = Drift.cosineHistogram(df, "id", "vec", sampleRate = 1.0)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(rows === Map(0L -> 1L, 10L -> 2L))
  }

  test("cosineHistogram: the md5 sample is a strict, deterministic subset") {
    val df = (1L to 200L).map(i => (i, Seq(i.toFloat, 1.0f))).toDF("id", "vec")
    val a = Drift.cosineHistogram(df, "id", "vec", sampleRate = 0.2)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    val b = Drift.cosineHistogram(df, "id", "vec", sampleRate = 0.2)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(a === b, "same salt + rate must sample identically")
    assert(a < 200L * 199L / 2L, "sample must actually subset")
  }
}
