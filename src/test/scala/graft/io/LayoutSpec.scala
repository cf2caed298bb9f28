package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("date-partitioned write prunes directories at planning time") {
    val day = 86400L
    val df = (0 until 30).map { i =>
      (i.toLong, new Timestamp((i / 10) * day * 1000), i * 1.0)
    }.toDF("id", "ts", "v") // 3 days, 10 rows each
    val out = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.writeDatePartitioned(df, "ts", out)

    // one file per date directory (repartition-on-partition-column)
    val dirs = new java.io.File(out).listFiles.filter(_.getName.startsWith("p_date="))
    assert(dirs.length === 3)
    dirs.foreach(d => assert(d.listFiles.count(_.getName.endsWith(".parquet")) === 1))

    val q = Layout.readDatePartitioned(spark, out)
      .filter(col("p_date") === lit("1970-01-02"))
      .agg(count(lit(1)), sum(col("v")))
    val row = q.collect()(0)
    assert(row.getLong(0) === 10 && row.getDouble(1) === (10 until 20).sum.toDouble)

    // evidence: the scan carries a partition filter and read ONE file.
    // AQE nests the real plan inside adaptive/query-stage wrappers, so
    // descend through them explicitly.
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan).head
    assert(scan.partitionFilters.nonEmpty, "scan must prune on p_date")
    assert(scan.metrics("numFiles").value === 1, "only the matching day's file is read")
  }
}
