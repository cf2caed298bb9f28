package graft.tools

import graft._

object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (i <- 1 to 2) time(s"ann_cosine $i")(SparkEntry.queries("q_ext_ann_cosine")(spark, dir).count())
    for (i <- 1 to 2) time(s"ann_lsh $i")(SparkEntry.queries("q_ext_ann_lsh")(spark, dir).count())
    spark.stop()
  }
}
