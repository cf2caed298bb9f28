package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reader for CAMS `csv_expert` files (SURVEY.md §2.1 S2).
  *
  * Format (reference `/root/reference/code/get-cams-solrad-ts.py:53-88`):
  * `;`-delimited; all metadata lines AND the header line are prefixed with
  * `#`; the **last** `#` line before the first data line is the header.
  *
  * Two-phase read, Spark-first:
  *  1. sniff the header from the top of the file (only the commented
  *     prefix is examined — a bounded driver-side read, independent of
  *     file size);
  *  2. one distributed `csv` scan with an explicit schema and
  *     `comment=#`, so every metadata line is skipped by the parser and
  *     column pruning / predicate pushdown work as usual.
  */
object CamsExpertCsv {

  /** Columns that stay strings; everything else in a csv_expert file is
    * numeric (irradiance, cloud cover, angles...).
    */
  private val stringCols = Set("Observation period")

  /** Driver-side header sniff: last `#`-prefixed line before data.
    * Probes geometrically from `initialProbe` lines, so an arbitrarily
    * long commented preamble still resolves — each probe reads only the
    * top of the file (a bounded driver-side read at any file size).
    */
  def sniffHeader(spark: SparkSession, path: String, initialProbe: Int = 256): Seq[String] = {
    val lines = spark.read.textFile(path)
    @annotation.tailrec
    def probe(limit: Int): Seq[String] = {
      val head = lines.head(limit)
      val commented = head.takeWhile(_.startsWith("#"))
      // Every fetched line commented and the probe full: the preamble may
      // continue past the window — widen and retry.
      if (commented.length == limit) probe(limit * 4) else commented
    }
    val commented = probe(initialProbe.max(1))
    require(commented.nonEmpty, s"no '#' header found in $path")
    commented.last.dropWhile(_ == '#').trim.split(";").map(_.trim).toSeq
  }

  def schemaFor(columns: Seq[String]): StructType =
    StructType(columns.map { c =>
      StructField(c, if (stringCols.contains(c)) StringType else DoubleType, nullable = true)
    })

  /** Read one csv_expert file (or a glob of files sharing a layout). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val cols = sniffHeader(spark, path)
    spark.read
      .option("sep", ";")
      .option("comment", "#")
      .option("mode", "PERMISSIVE") // failure isolation: bad lines -> nulls
      .schema(schemaFor(cols))
      .csv(path)
  }
}
