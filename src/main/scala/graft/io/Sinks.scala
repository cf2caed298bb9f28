package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S7, S8).
  *
  * The reference's NetCDF cube sink (`/root/reference/code/compile-solrad.py:176-195`)
  * maps to partitioned long-format Parquet plus a JSON attribute sidecar:
  * the dense (station × time) xarray cube is an artifact of the NetCDF
  * container, not of the data — long format is the scalable canonical
  * form (35 stations is nothing; 100 TB of (station, time) rows is a
  * partitioned columnar table).
  */
object Sinks {

  /** S7: single-header CSV, time-ordered, for small summary outputs only
    * (`coalesce(1)` is deliberate — never use for large data).
    */
  def writeCsv(df: DataFrame, path: String, orderCol: Option[String] = None): Unit = {
    val ordered = orderCol.fold(df)(c => df.orderBy(col(c)))
    ordered.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
  }

  /** CF-style global attributes from the reference compile step
    * (`compile-solrad.py:156-173`).
    */
  def cfAttributes(extra: Map[String, String] = Map.empty): Map[String, String] = Map(
    "featureType" -> "timeSeries",
    "Conventions" -> "CF-1.8",
    "time_units" -> "seconds since 1970-01-01",
    "calendar" -> "proleptic_gregorian",
    "station_cf_role" -> "timeseries_id",
    "GHI_units" -> "Wh/m^2",
    "DHI_units" -> "Wh/m^2",
    "DNI_units" -> "Wh/m^2"
  ) ++ extra

  /** S8: long-format cube sink — parquet partitioned by station so
    * per-station reads prune partitions, with time carried both as
    * timestamp and epoch seconds (the NetCDF encoding), plus a JSON
    * metadata sidecar holding the CF attributes.
    */
  def writeCube(df: DataFrame, path: String, attrs: Map[String, String] = cfAttributes()): Unit = {
    val withEpoch = df
      .withColumn("time_epoch", unix_timestamp(col("time_utc")))
    withEpoch.write.mode("overwrite").partitionBy("station").parquet(path)
    val json = attrs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "${k}": "${v}"""" }
      .mkString("{\n", ",\n", "\n}")
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(s"$path/_attributes.json"), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
