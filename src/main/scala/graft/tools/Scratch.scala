package graft.tools

import graft._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // warm
    SparkEntry.queries("q_a2_linreg")(spark, dir).count()
    spark.sparkContext.setLogLevel("INFO")
    val t0 = System.nanoTime()
    SparkEntry.queries("q_a2_linreg")(spark, dir).count()
    println(f"[scratch] q_a2 timed ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.sparkContext.setLogLevel("WARN")
    spark.stop()
  }
}
