package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every entry point (Verify, Bench,
  * tests) shares, so correctness-critical settings can't drift.
  */
object Sessions {

  /** Apply the engine's required settings to a builder. */
  def tuned(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // engine extensions: native vector/text-hash functions, the HOF
      // dot-product rewrite, and the window-top-k operator rewrite +
      // strategy (graft.plans.TopKPerKey)
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
      // events.parquet carries TIMESTAMP(NANOS); read as long, converted
      // to TimestampType in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = tuned(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
