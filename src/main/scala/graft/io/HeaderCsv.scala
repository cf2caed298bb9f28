package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Header CSV scan with optional-column tolerance (SURVEY.md §1.3, §2.1
  * S3/S4): real files carry any subset of a canonical schema (e.g. the QC
  * flag columns, `solrad-compare.py:39`), so the schema is built at plan
  * time from the file's own header, typed by the canonical schema.
  * Unknown columns read as strings rather than failing.
  */
object HeaderCsv {

  /** Driver-side header sniff: first line of the file. Bounded read. */
  def sniffColumns(spark: SparkSession, path: String, sep: String = ","): Seq[String] =
    spark.read.textFile(path).first().split(java.util.regex.Pattern.quote(sep))
      .map(_.trim).toSeq

  /** Read with types from `canonical` for the columns that exist. */
  def read(spark: SparkSession, path: String, canonical: StructType, sep: String = ","): DataFrame = {
    val present = sniffColumns(spark, path, sep)
    val schema = StructType(present.map { c =>
      canonical.fields.find(_.name == c).getOrElse(StructField(c, StringType))
    })
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .schema(schema)
      .csv(path)
  }
}
