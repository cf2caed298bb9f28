package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration escape hatch: run (and dump oracles for) a subset.
    // The driver never sets this, so the gate always sees the full map.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Crash-loudness contract: a crashed query is simply ABSENT from the
    // driver's correctness JSON, and nothing downstream would notice the
    // declared surface silently shrank. Reconcile dumps against the
    // declared query map and leave a machine-readable diff in-tree.
    val declared = SparkEntry.queries.keys.filter(keep).toSeq.sorted
    val missing = declared.filterNot(n =>
      Files.exists(Paths.get(s"$outDir/$n/_SUCCESS")))
    Files.writeString(Paths.get(s"$outDir/_verify_manifest.json"),
      s"""{"declared": ${declared.size}, "dumped": ${declared.size - missing.size},""" +
        s""" "missing": [${missing.map("\"" + _ + "\"").mkString(", ")}]}""")
    if (missing.nonEmpty)
      System.err.println(
        s"[verify] INCOMPLETE: ${missing.size}/${declared.size} declared " +
          s"queries wrote no output: ${missing.mkString(", ")}")
    else
      System.err.println(s"[verify] complete: ${declared.size}/${declared.size} dumped")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
