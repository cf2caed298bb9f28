package graft.io

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("cube sink: per-station reads prune partitions at the scan") {
    val cube = Seq(
      ("aaa", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("bbb", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0)
    ).toDF("station", "time_utc", "GHI")
    val out = Files.createTempDirectory("graft-sink").resolve("cube").toString
    Sinks.writeCube(cube, out)

    val pruned = spark.read.parquet(out).filter($"station" === "aaa")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("station"), s"no partition pruning:\n$plan")
    assert(pruned.count() === 1)
    // epoch-seconds encoding present (the NetCDF time contract, F16)
    assert(pruned.select("time_epoch").as[Long].head() === 1704067200L)
  }

  test("writeCsv orders by the requested column and writes one header file") {
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    val out = Files.createTempDirectory("graft-csv").resolve("out").toString
    Sinks.writeCsv(df, out, orderCol = Some("k"))
    val lines = spark.read.option("header", "true").csv(out)
      .select("k").as[String].collect().toSeq
    assert(lines === Seq("1", "2", "3"))
  }
}
