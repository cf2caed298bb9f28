package graft.tools

import graft.Sessions

/** Build (or reuse) a ScaleReplicate replica dir for micro-bench runs:
  * {{{ runMain graft.tools.ReplicateDir <srcDir> <dstDir> <times> }}}
  */
object ReplicateDir {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, times) = args
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.io.ScaleReplicate.ensure(spark, src, dst, times.toInt)
    println(s"[replicate] $dst x$times ready")
    spark.stop()
  }
}
