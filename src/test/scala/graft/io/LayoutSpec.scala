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

  test("shardId matches its SQL spelling and is stable; writeSharded = one file per shard") {
    val n = 4
    val ids = (0L until 200L).toDF("id")
    val got = ids.select(col("id"), Layout.shardId(col("id"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference arithmetic, computed independently
    got.foreach { case (id, s) =>
      val expect = (id % 2147483647L) * 48271L % 2147483647L % n
      assert(s === expect, s"shard($id)")
    }
    // ANSI-safe on ids beyond 2^32 (the scaled-replica regression)
    val big = Seq(40000000000L, Long.MaxValue - 1).toDF("id")
      .select(Layout.shardId(col("id"), n)).as[Long].collect()
    assert(big.forall(s => s >= 0 && s < n))
    assert(got.values.toSet.subsetOf((0L until n).toSet))
    // every shard populated at this cardinality
    assert(got.values.toSet.size === n)

    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/t"
    Layout.writeSharded(
      (0L until 200L).map(i => (i, s"doc$i")).toDF("id", "payload"), "id", n, out)
    val dirs = new java.io.File(out).listFiles.filter(_.getName.startsWith("shard="))
    assert(dirs.length === n)
    dirs.foreach(d => assert(d.listFiles.count(_.getName.endsWith(".parquet")) === 1))
    // read-back preserves every row exactly once
    assert(spark.read.parquet(out).count() === 200L)
  }

  test("compact rewrites a many-small-files layout into few even files, data intact") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val in = s"$root/in"
    val out = s"$root/out"
    // 64 tiny files
    (0L until 1000L).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(64).write.parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles === 64)
    val n = Layout.compact(spark, in, out, targetFileBytes = 512L * 1024)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === n && outFiles < 8, s"got $outFiles files")
    // content identical
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ===
      (0L until 1000L).map(i => (i, s"row$i")).toSet)
  }

  test("writeShuffled: files are PHYSICALLY in (hash, id) order per shard") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("shuffled").toString + "/x"
    val df = (0L until 500L).map(i => (i, s"d$i")).toDF("id", "v")
    Layout.writeShuffled(df, "id", "ep0", 4, out)
    val shardDirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length === 4)
    shardDirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName}: one file per shard")
      // read the single file directly — small file = one split, so the
      // collected order IS the physical row order
      val rows = spark.read.parquet(files.head.toString)
        .select(graft.ext.Sampling.hashHex(col("id"), "ep0").as("h"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"${d.getName}: rows must be stored in (hash, id) order")
    }
    // membership matches the portable shard arithmetic
    val back = spark.read.parquet(out)
      .select(col("id"), col("shard").cast("long").as("s"),
        Layout.shardId(col("id"), 4).as("expect"))
    assert(back.filter(col("s") =!= col("expect")).count() === 0)
    // rejects a clashing reserved column
    intercept[IllegalArgumentException] {
      Layout.writeShuffled(df.withColumnRenamed("v", "shard"), "id", "s", 2, out)
    }
  }
}
