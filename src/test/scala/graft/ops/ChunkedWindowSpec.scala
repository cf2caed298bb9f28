package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkTestBase

/** ChunkedWindow / interpolateLinearChunked: the chunked forms must be
  * row-identical to the single-partition global-window forms, and their
  * physical plans must contain NO WindowExec with an empty partition
  * spec (the "No Partition Defined" scale hazard).
  */
class ChunkedWindowSpec extends SparkTestBase {
  import spark.implicits._

  // AQE wraps the plan in AdaptiveSparkPlanExec / QueryStageExec nodes
  // whose children aren't visible to a plain collect — run the query
  // first, then walk through the adaptive wrappers explicitly.
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(q.plan)
    case other => other.children.flatMap(allNodes)
  })

  private def noGlobalWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    df.write.format("noop").mode("overwrite").save()
    val windows = allNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected WindowExec nodes in the plan")
    val bad = windows.filter(_.partitionSpec.isEmpty)
    assert(bad.isEmpty, s"found ${bad.size} unpartitioned WindowExec nodes")
  }

  // A gappy series: bucket times with irregular gaps so some day-chunks
  // hold a single row and some are missing entirely.
  private lazy val series = {
    val rnd = new scala.util.Random(7)
    val ts = Iterator.iterate(0L)(t => t + 600L * (1 + rnd.nextInt(200)))
      .take(400).toSeq
    ts.map(t => (t, math.sin(t.toDouble / 5000) * 10)).toDF("t", "v")
  }

  test("rolling stats over carries == global window, including sparse chunks") {
    val global = {
      val w = Window.orderBy("t")
      val f = w.rowsBetween(-2, 1)
      series.select(col("t"),
        round(avg("v").over(f), 9).as("m"),
        round(col("v") - lag("v", 1).over(w), 9).as("d"),
        count(lit(1)).over(f).as("n"))
    }
    val chunked = {
      val c = ChunkedWindow.withCarries(series, "t", 86400L, before = 2, after = 1)
      val w = Window.partitionBy(ChunkedWindow.chunk).orderBy("t")
      val f = w.rowsBetween(-2, 1)
      ChunkedWindow.finish(c.select(
        col(ChunkedWindow.chunk), col(ChunkedWindow.carry),
        col("t"),
        round(avg("v").over(f), 9).as("m"),
        round(col("v") - lag("v", 1).over(w), 9).as("d"),
        count(lit(1)).over(f).as("n")))
    }
    assert(chunked.count() === series.count())
    assert(chunked.exceptAll(global).isEmpty && global.exceptAll(chunked).isEmpty)
    noGlobalWindow(chunked)
  }

  test("zero carry depths degrade to plain chunk tagging") {
    val c = ChunkedWindow.withCarries(series, "t", 86400L, 0, 0)
    assert(c.filter(col(ChunkedWindow.carry)).isEmpty)
    assert(ChunkedWindow.finish(c).count() === series.count())
  }

  test("chunked interpolation == global interpolation, incl. all-null chunks and edges") {
    // Dense grid with long null runs (spanning whole chunks) and
    // leading/trailing nulls that must stay null.
    val dense = (0 until 2000).map { i =>
      val t = i * 600L
      val v = if (i < 3 || i > 1995 || (i % 700) < 300) null
              else (math.cos(i / 37.0) * 5: java.lang.Double)
      (t, v)
    }.toDF("t", "v")
    val global = Resample.interpolateLinear(dense, "t", "v")
    val chunked = Resample.interpolateLinearChunked(dense, "t", "v", 86400L)
    assert(chunked.count() === dense.count())
    assert(chunked.exceptAll(global).isEmpty && global.exceptAll(chunked).isEmpty)
    noGlobalWindow(chunked)
    // edges really are null, interior gaps really filled: the leading
    // run is i in [0,299] (300 rows), the trailing run i in [1996,1999]
    // (4 rows); the interior whole-chunk null runs all fill.
    assert(chunked.filter(col("t") === 0 && col("v").isNull).count() === 1)
    assert(chunked.filter(col("v").isNull).count() === 304L)
  }
}
