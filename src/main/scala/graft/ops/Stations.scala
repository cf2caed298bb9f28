package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Station-name scalar functions and metadata joins
  * (SURVEY.md §2.8 F11–F15, §2.3 J2/J3).
  *
  * Reference:
  *  - canonicalization pipeline `/root/reference/code/compile-solrad.py:11-23`
  *  - filename sanitization `/root/reference/code/get-cams-solrad-ts.py:137`
  *  - filename station extraction `/root/reference/code/compile-solrad.py:76`
  *  - metadata lookup join `/root/reference/code/compile-solrad.py:92-99`
  *
  * All built-in column compositions (no UDFs) so they stay inside
  * whole-stage codegen and push down through joins.
  */
object Stations {

  /** F12: canonical station key — `_`→space, lowercase, strip everything
    * but `[a-z0-9 ]`, collapse whitespace, trim. Idempotent.
    */
  def cleanStationName(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(regexp_replace(c, "_", " ")), "[^a-z0-9 ]", ""),
      "\\s+", " "))

  /** F11: filename-safe name — anything outside `[\w.-]` becomes `_`. */
  def sanitizeFileName(c: Column): Column = regexp_replace(c, "[^\\w.-]", "_")

  /** F15: underscores → spaces for display titles. */
  def prettify(c: Column): Column = regexp_replace(c, "_", " ")

  /** F13: extract the station name from a data filename. */
  def stationFromFileName(pattern: String): Column =
    regexp_extract(input_file_name(), pattern, 1)

  /** J2: attach station metadata by canonical key via broadcast hash join
    * — the metadata table is tiny (tens of rows) at any data scale, so
    * this never shuffles the fact side. Inner join doubles as the J3
    * membership validation (rows with unknown stations drop out).
    */
  def attachMetadata(
      data: DataFrame,
      locations: DataFrame,
      dataKey: Column,
      locationsNameCol: String = "station"): DataFrame = {
    val meta = locations.withColumn("station_key", cleanStationName(col(locationsNameCol)))
    data.withColumn("station_key", cleanStationName(dataKey))
      .join(broadcast(meta), Seq("station_key"), "inner")
  }

  /** P7: drop rows whose canonical station key matches an excluded name. */
  def excludeStation(df: DataFrame, stationCol: Column, excluded: String): DataFrame =
    df.filter(cleanStationName(stationCol) =!= cleanStationName(lit(excluded)))
}
