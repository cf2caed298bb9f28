package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Irradiance unit conversion (SURVEY.md §2.8 F7).
  *
  * Reference: `/root/reference/code/solrad-compare.py:61-66` — CAMS
  * irradiance is Wh/m² accumulated per 1-minute step; ×60 converts to
  * W/m². Applied only to the columns that actually exist (schema checked
  * at plan time).
  */
object Units {

  val irradianceCols: Seq[String] = Seq("GHI", "DHI", "BNI", "DNI")

  /** Multiply each present column in `cols` by `factor`. */
  def scaleColumns(df: DataFrame, cols: Seq[String], factor: Double): DataFrame = {
    val present = cols.filter(df.columns.contains)
    present.foldLeft(df)((d, c) => d.withColumn(c, col(c) * factor))
  }

  /** Wh/m²-per-minute → W/m² on whichever irradiance columns exist. */
  def whPerMinuteToWatts(df: DataFrame, cols: Seq[String] = irradianceCols): DataFrame =
    scaleColumns(df, cols, 60.0)
}
