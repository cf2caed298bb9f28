package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark main: every SparkEntry query timed on
  * `SPARK_GRAFT_SF_DIR`, one JSON line on stdout.
  *
  * Measurement discipline (round-1 postmortem):
  *  - Queries are *materialized through the no-op sink*, not `.count()` —
  *    a `count(1)` lets Catalyst prune every unused projection, so
  *    pure-projection queries were being benchmarked as bare scans. The
  *    noop sink evaluates every output column and discards the rows,
  *    which is the honest cost of the plan.
  *  - Median of `SPARK_GRAFT_BENCH_ITERS` (default 3) runs per query, so
  *    one GC pause or JIT warmup blip doesn't define the number.
  *  - `System.gc()` before every run: round 1 showed heap pressure from
  *    the heavy dedup queries bleeding into unrelated trivial queries
  *    (a broadcast join of two pre-aggregated series measured 55 s).
  *    The fence keeps each query's timing its own.
  */
object Bench {

  private def runOnce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val spark = Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths once so timings measure
    // the plan, not first-use classloading.
    SparkEntry.queries.get("q_a1_resample").foreach { fn =>
      try runOnce(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        System.gc()
        val t0 = System.nanoTime()
        try {
          runOnce(fn(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }.sorted
      val median = if (times.isEmpty) -1.0 else times(times.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
