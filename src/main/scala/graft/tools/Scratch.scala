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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mh = SparkEntry.queries("q_ext_dedup_minhash")(spark, dir)
    time("minhash sf0.01")(mh.count())
    val sh = SparkEntry.queries("q_ext_dedup_simhash")(spark, dir)
    time("simhash sf0.01")(sh.count())
    println(sh.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
