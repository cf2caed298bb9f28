package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.types._

class StreamEnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-static enrichment attaches metadata per micro-batch; inner drops unknowns") {
    val dir = Files.createTempDirectory("graft-enrich").toString
    val schema = StructType(Seq(
      StructField("station", StringType), StructField("ghi", DoubleType)))

    val dim = Seq(("alpha", -6.25, 106.75), ("beta", -7.5, 110.25))
      .toDF("station", "latitude", "longitude")

    Seq(("alpha", 100.0), ("ghost", 1.0)).toDF("station", "ghi")
      .write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).format("parquet")
      .option("path", s"$dir/*").load()
    val q = StreamEnrich.enrich(stream, dim, Seq("station"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      q.processAllAvailable()
      // second micro-batch re-joins the static side
      Seq(("beta", 50.0)).toDF("station", "ghi").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT station, ghi, latitude FROM enriched ORDER BY station").collect()
      assert(rows.map(_.getString(0)).toSeq === Seq("alpha", "beta")) // ghost dropped
      assert(rows(0).getDouble(2) === -6.25)
      assert(rows(1).getDouble(1) === 50.0)
    } finally q.stop()

    // left_outer keeps the unknown station with null metadata
    val q2 = StreamEnrich.enrich(stream, dim, Seq("station"), "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("enriched_lo").start()
    try {
      q2.processAllAvailable()
      val ghost = spark.sql(
        "SELECT latitude FROM enriched_lo WHERE station = 'ghost'").collect()
      assert(ghost.length === 1 && ghost(0).isNullAt(0))
    } finally q2.stop()
  }
}
