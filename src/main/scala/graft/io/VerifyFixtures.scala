package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Deterministic on-disk CSV fixtures for the oracle-gated IO queries
  * (`q_s2_cams_scan`, `q_s5_compile_cube`).
  *
  * Round 1 left the whole CSV/IO layer (S1–S8) covered by ScalaTest only;
  * these fixtures let the driver's DuckDB gate drive the *real* parse
  * paths: the commented-header `;`-separated csv_expert reader
  * (reference `code/get-cams-solrad-ts.py:62-96`) and the glob-scan +
  * filename-provenance + broadcast-metadata compile pipeline
  * (reference `code/compile-solrad.py:25-195`).
  *
  * Both the Spark query and the DuckDB oracle read the same files, so the
  * writers are pure functions of nothing: byte-identical on every call,
  * written idempotently under `target/verify-fixtures/`. Values are exact
  * binary fractions (quarters) so aggregation order can never move a
  * rounded result.
  */
object VerifyFixtures {

  val root = "/root/repo/target/verify-fixtures"

  // ----------------------------------------------------------- csv_expert
  /** Number of `#` lines atop the CAMS fixture (metadata + header) — the
    * DuckDB oracle skips exactly this many. Over 256 on purpose: the
    * driver path then exercises sniffHeader's widening probe too.
    */
  val camsPreambleLines = 300

  val camsPath = s"$root/cams/raw_1min_alpha_site_observed_cloud.csv"

  /** 3 h of 1-min rows minus a 15-min outage, plus two corrupt lines:
    * one garbage-everywhere (dropped via unparseable time, pandas
    * `errors='coerce'` semantics) and one with a valid time but a
    * non-numeric GHI (kept; GHI contributes null to its bucket mean).
    */
  def camsExpertFixture(): String = writeIfAbsent(Paths.get(camsPath)) {
    val sb = new StringBuilder
    (1 until camsPreambleLines).foreach { i =>
      sb ++= s"# Metadata line $i: CAMS solar radiation timeseries fixture;;;;\n"
    }
    sb ++= "# Observation period;GHI;DHI;BNI;Cloud coverage\n"
    def iso(min: Int): String = {
      val h = min / 60; val m = min % 60
      f"2024-03-01T$h%02d:$m%02d:00.0"
    }
    (0 until 180).foreach { i =>
      if (i < 60 || i >= 75) { // 15-minute outage: bucket 01:00 empty, 01:10 partial
        if (i == 30) sb ++= "not_a_time/also_bad;oops;42;x;y\n"
        val row = s"${iso(i)}/${iso(i + 1)};" +
          (if (i == 45) "abc" else s"${100 + (i % 40) * 0.25}") +
          s";${50 + (i % 23) * 0.5};${200 + (i % 17) * 0.25};${(i % 101) * 0.25}"
        sb ++= row + "\n"
      }
    }
    sb.result()
  }

  /** Output directory for the S7 CSV-sink round-trip query — written by
    * `q_s7_csv_sink` at query-construction time, read back by both the
    * Spark query and the DuckDB oracle.
    */
  val csvSinkDir = s"$root/csv_sink"

  // ------------------------------------------------------ compile pipeline
  val processedDir = s"$root/processed"
  val processedGlob = s"$processedDir/processed_10min_*_observed_cloud.csv"
  val locationPath = s"$root/processed/asrs_location.csv"

  /** Station set exercising every compile edge: canonicalization across
    * `_`/`-`/case (`Beta-2` file ↔ `Beta-2` metadata via key `beta2`),
    * the exclusion filter (Sleman), a file with no metadata row (Gamma —
    * dropped by the inner broadcast join), a metadata row with no file
    * (Delta), and a corrupt-time line (dropped by the lenient parse).
    */
  private val stations = Seq(
    // (file tag, metadata name, lat, lon, elev, tz, has file, in metadata)
    ("Alpha_Site", "Alpha_Site", -6.25, 106.75, 25.0, "UTC+7", true, true),
    ("Beta-2", "Beta-2", -7.5, 110.25, 150.5, "UTC-3", true, true),
    ("Sleman", "Sleman", -7.75, -110.25, 210.0, "UTC+7", true, true),
    ("Gamma", "Gamma", 0.0, 0.0, 0.0, "UTC+0", true, false),
    ("Delta", "Delta", 1.5, 120.5, 75.25, "UTC+9", false, true))

  /** Writes the per-station processed files + the station metadata CSV;
    * returns (glob, metadataCsvPath).
    */
  def compileFixture(): (String, String) = {
    stations.zipWithIndex.foreach { case ((tag, _, _, _, _, _, hasFile, _), idx) =>
      if (hasFile) {
        writeIfAbsent(Paths.get(s"$processedDir/processed_10min_${tag}_observed_cloud.csv")) {
          val sb = new StringBuilder
          sb ++= "time,GHI,DHI,BNI,Cloud coverage\n"
          (0 until 8).foreach { i =>
            if (idx == 0 && i == 3) sb ++= "not-a-timestamp,1.0,2.0,3.0,4.0\n"
            val m = i * 10
            sb ++= f"2024-03-01 ${m / 60}%02d:${m % 60}%02d:00," +
              s"${100.0 * (idx + 1) + i * 0.5},${40.0 * (idx + 1) + i * 0.25}," +
              s"${150.0 * (idx + 1) + i * 0.75},${i * 2.5}\n"
          }
          sb.result()
        }
      }
    }
    writeIfAbsent(Paths.get(locationPath)) {
      val rows = stations.zipWithIndex.collect {
        case ((_, name, lat, lon, elev, tz, _, inMeta), i) if inMeta =>
          s"${i + 1},$name,$lat,$lon,$elev,$tz"
      }
      "no,station,latitude,longitude,elevation,timezone\n" + rows.mkString("\n") + "\n"
    }
    (processedGlob, locationPath)
  }

  private def writeIfAbsent(p: Path)(content: => String): String = {
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if (!Files.exists(p) || !java.util.Arrays.equals(Files.readAllBytes(p), bytes)) {
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
    p.toString
  }
}
