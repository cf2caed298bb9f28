package graft.tools

import java.nio.file.{Files, Paths}
import graft._

/** Dump `.explain("formatted")` for the named queries to individual
  * files — the round-10 optimization evidence trail
  * (`plans/r10/<query>_<tag>.txt`).
  * {{{ runMain graft.tools.PlanDump <tag> <outDir> <q1,q2,...> [dataDir] }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = Paths.get(args(1))
    val names = args(2).split(",").toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    Files.createDirectories(outDir)
    val spark = Sessions.local()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      println(s"[plandump] $n -> ${outDir.resolve(s"${n}_$tag.txt")}")
    }
    spark.stop()
  }
}
