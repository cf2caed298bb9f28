package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the four input shapes (SURVEY.md §1.1).
  * The reference relies on pandas inference; the engine fixes schemas at
  * the boundary (§1.3) — inference was an artifact, not a capability.
  */
object Schemas {

  /** Station metadata CSV (`input/asrs_location.csv` + the `timezone`
    * column the compile step requires, `compile-solrad.py:52`).
    */
  val station: StructType = StructType(Seq(
    StructField("no", IntegerType),
    StructField("station", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("elevation", DoubleType),
    StructField("timezone", StringType) // 'UTC+7'; optional in the shipped file
  ))

  /** Columns the downloader requires in the station file
    * (`get-cams-solrad-ts.py:119-121`).
    */
  val requiredStationCols: Set[String] = Set("latitude", "longitude", "elevation", "station")

  /** Processed 10-minute CAMS series CSV (`get-cams-solrad-ts.py:96`). */
  val processed10Min: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("GHI", DoubleType),
    StructField("DHI", DoubleType),
    StructField("BNI", DoubleType),
    StructField("Cloud coverage", DoubleType) // optional
  ))

  /** QC-flagged ground measurement CSV (`solrad-compare.py:22-44`).
    * Any subset of the flag columns may be present.
    */
  val groundQc: StructType = StructType(
    StructField("Datetime (UTC)", TimestampType) +:
      Seq("GHI", "DHI", "DNI").map(StructField(_, DoubleType)) ++:
      Seq("flag_ghi", "flag_dhi", "flag_dni", "flag_ghi_rare", "flag_dhi_rare",
        "flag_dni_rare", "flag_comp1", "flag_comp2").map(StructField(_, IntegerType)))
}
