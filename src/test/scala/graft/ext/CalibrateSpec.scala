package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkTestBase {

  import spark.implicits._

  // Two sources on deliberately incompatible scales. Pooled order
  // statistics are hand-computable: values 0..4 and 10..14, n = 10, so
  // p25 → index 2.25 → 2.25, p50 → index 4.5 → 4 + 0.5·(10−4) = 7,
  // p75 → index 6.75 → 11 + 0.75·(12−11) = 11.75.
  private def fixture = Seq(
    ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
    ("b", 10.0), ("b", 11.0), ("b", 12.0), ("b", 13.0), ("b", 14.0))
    .toDF("src", "score")

  test("quantileTable: per-source and pooled quantiles at the grid") {
    val t = Calibrate.quantileTable(fixture, "src", "score", Seq(0.25, 0.5, 0.75))
    val rows = t.orderBy("source", "q")
      .select("source", "q", "src_val", "ref_val", "delta")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq === Seq(
      ("a", 0.25, 1.0, 2.25, 1.25),
      ("a", 0.5, 2.0, 7.0, 5.0),
      ("a", 0.75, 3.0, 11.75, 8.75),
      ("b", 0.25, 11.0, 2.25, -8.75),
      ("b", 0.5, 12.0, 7.0, -5.0),
      ("b", 0.75, 13.0, 11.75, -1.25)))
  }

  test("applyQuantileMap: interior interpolation, endpoint clamp, unknown-source passthrough") {
    val t = Calibrate.quantileTable(fixture, "src", "score", Seq(0.25, 0.5, 0.75))
    val probes = Seq(
      ("b", 12.0),  // exactly a grid point → its ref_val
      ("b", 11.5),  // midway 11→12 maps midway 2.25→7
      ("b", 10.0),  // below grid → clamp to first ref
      ("b", 14.0),  // above grid → clamp to last ref
      ("c", 99.0))  // source with no table entry → passthrough
      .toDF("src", "score")
    val out = Calibrate.applyQuantileMap(probes, t, "src", "score")
      .orderBy("src", "score")
      .select(col("src"), col("score"), col("score_cal"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("b", 10.0, 2.25),
      ("b", 11.5, 4.625),
      ("b", 12.0, 7.0),
      ("b", 14.0, 11.75),
      ("c", 99.0, 99.0)))
  }

  test("isotonicBinned: adjacent violators pool to their weighted mean") {
    // bins 0/1/2 with rates 0.2 / 0.1 / 0.6 and equal weight: PAV
    // pools the first two to 0.15, leaves the third alone.
    def block(lo: Double, pos: Int, n: Int) =
      (0 until n).map(i => (lo, i < pos))
    val df = (block(0.1, 2, 10) ++ block(0.5, 1, 10) ++ block(0.9, 6, 10))
      .toDF("score", "good")
    val rows = Calibrate.isotonicBinned(df, "score", "good", bins = 3)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Double]("raw_rate"), r.getAs[Double]("iso_rate"))).toMap
    assert(rows(0L) === ((0.2, 0.15)))
    assert(rows(1L) === ((0.1, 0.15)))
    assert(rows(2L) === ((0.6, 0.6)))
  }

  test("isotonicBinned: already-monotone rates pass through unchanged") {
    def block(lo: Double, pos: Int, n: Int) =
      (0 until n).map(i => (lo, i < pos))
    val df = (block(0.1, 1, 10) ++ block(0.5, 5, 10) ++ block(0.9, 9, 10))
      .toDF("score", "good")
    val rows = Calibrate.isotonicBinned(df, "score", "good", bins = 3)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("iso_rate") === r.getAs[Double]("raw_rate"))
    }
  }

  test("isotonicBinned: output is monotone non-decreasing even when raw is chaos") {
    val df = (1 to 400).map { i =>
      (i % 20 / 20.0, (i * 2654435761L % 89) < (if (i % 3 == 0) 60 else 20))
    }.toDF("score", "good")
    val rows = Calibrate.isotonicBinned(df, "score", "good", bins = 10)
      .collect().sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("iso_rate"))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("grid preconditions fail fast") {
    val df = fixture
    intercept[IllegalArgumentException](
      Calibrate.quantileTable(df, "src", "score", Seq.empty))
    intercept[IllegalArgumentException](
      Calibrate.quantileTable(df, "src", "score", Seq(0.5, 0.25)))
    intercept[IllegalArgumentException](
      Calibrate.quantileTable(df, "src", "score", Seq(0.0, 0.5)))
  }
}
