package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.ops.Resample

/** Throughput probe at the reference's real yearly volume (BASELINE.md):
  * 35 stations × 2 sky types × 527,040 minutes (2024) ≈ 36.9M 1-minute
  * rows → tumbling 10-min mean keyed by (station, sky_type). Generated
  * with spark.range (no driver materialization), so the number measures
  * the resample plan itself — the reference's entire compute-bound
  * workload for a year — end to end.
  */
object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val stations = 35
    val skyTypes = 2
    val minutes = 527040L // 366 days
    val n = stations * skyTypes * minutes

    val raw = spark.range(n).select(
      (col("id") % stations).cast("int").as("station"),
      ((col("id") / stations) % skyTypes).cast("int").as("sky_type"),
      timestamp_seconds(lit(1704067200L) + (col("id") / (stations * skyTypes)) * 60).as("time"),
      (rand(42) * 60.0).as("GHI"),
      (rand(43) * 30.0).as("DHI"),
      (rand(44) * 80.0).as("BNI"))

    val t0 = System.nanoTime()
    val out = Resample.tumblingMean(raw, "time", 10,
      valueCols = Seq("GHI", "DHI", "BNI"), extraKeys = Seq("station", "sky_type"))
    // noop sink, not count(): a count(1) would let Catalyst prune the
    // avg columns and measure only the grouping (same honesty fix as
    // Bench) — the sink evaluates every output column
    out.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val buckets = minutes / 10 * stations * skyTypes
    println(f"[probe] rows=$n buckets=$buckets time=$secs%.1f s throughput=${n / secs / 1e6}%.1f M rows/s")
    spark.stop()
  }
}
