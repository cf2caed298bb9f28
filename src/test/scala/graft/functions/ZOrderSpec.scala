package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int = 8): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits))
      .head().getLong(0)

  test("zValue interleaves bit-for-bit (x at even positions, y at odd)") {
    // x=5 (101), y=3 (011): z = x0 + y0<<1 + y1<<3 + x2<<4 = 1+2+8+16
    assert(z(5L, 3L, 4) === 27L)
    assert(z(0L, 0L) === 0L)
    assert(z(255L, 0L) === 0x5555L) // all even bits
    assert(z(0L, 255L) === 0xAAAAL) // all odd bits
    assert(z(255L, 255L) === 0xFFFFL)
  }

  test("zValue is pointwise monotone: dominance in both dims implies z order") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for {
      a @ (ax, ay) <- grid
      b @ (bx, by) <- grid
      if ax <= bx && ay <= by
    } assert(zs(a) <= zs(b), s"z($a)=${zs(a)} > z($b)=${zs(b)}")
  }

  test("zValueN: d=2 layout equals zValue; d=3 separates dimension bits") {
    val two = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("a"),
        ZOrder.zValueN(Seq(col("x"), col("y")), 4).as("b")).head()
    assert(two.getLong(0) === two.getLong(1))
    // d=3: x0 -> bit0, y0 -> bit1, w0 -> bit2, x1 -> bit3 ...
    val z3 = Seq((1L, 1L, 1L)).toDF("x", "y", "w")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("w")), 2)).head().getLong(0)
    assert(z3 === 7L)
    intercept[IllegalArgumentException] {
      ZOrder.zValueN(Seq(col("x")), 63)
    }
  }

  test("writeZOrdered layout: 2-D box predicate is pushed to the parquet scan") {
    val out = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val df = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, x * 64 + y))
      .toDF("x", "y", "payload")
    graft.io.Layout.writeZOrdered(
      df, ZOrder.zValue(col("x"), col("y"), 6), out, 4)
    val read = spark.read.parquet(out)
      .filter(col("x").between(8, 15) && col("y").between(40, 47))
    assert(read.count() === 64L)
    val scan = read.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(x,8)") &&
      pushed.contains("LessThanOrEqual(y,47)"),
      s"expected both dims pushed, got: $pushed")
  }
}
