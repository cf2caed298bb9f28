package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  test("haversineKm: quarter great circle and zero distance") {
    val df = Seq((0.0, 0.0, 0.0, 90.0), (5.0, 5.0, 5.0, 5.0))
      .toDF("la1", "lo1", "la2", "lo2")
    val d = df.select(
      Spatial.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2"))
        .as("d")).collect().map(_.getDouble(0))
    assert(math.abs(d(0) - math.Pi / 2 * 6371.0088) < 0.01)
    assert(d(1) === 0.0)
  }

  test("nearestBroadcast: picks the globally closest station") {
    val probes = Seq((1L, 0.0, 0.0), (2L, 9.9, 9.9)).toDF("id", "lat", "lon")
    val st = Seq((10L, 0.0, 1.0), (20L, 10.0, 10.0)).toDF("station_id", "lat", "lon")
    val out = Spatial.nearestBroadcast(probes, "id", st, "station_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 10L, 2L -> 20L))
  }

  test("nearestGrid: agrees with brute force on a dense lattice") {
    val stations = (for { y <- 0 until 8; x <- 0 until 8 }
      yield ((y * 8 + x).toLong, y.toDouble, x.toDouble))
      .toDF("station_id", "lat", "lon")
    val probes = (for { y <- 1 until 7; x <- 1 until 7 }
      yield ((y * 10 + x).toLong, y + 0.3, x + 0.4))
      .toDF("id", "lat", "lon")
    val grid = Spatial.nearestGrid(probes, "id", stations, "station_id", 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    val brute = Spatial.nearestBroadcast(probes, "id", stations, "station_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grid.view.mapValues(_._1).toMap === brute)
    // every probe is well inside a cell, so the ring bound certifies it
    assert(grid.values.forall(_._2))
  }

  test("radiusJoinGrid: equals the brute-force radius join") {
    val stations = (for { y <- 0 until 6; x <- 0 until 6 }
      yield ((y * 6 + x).toLong, y.toDouble, x.toDouble))
      .toDF("station_id", "lat", "lon")
    val probes = (for { y <- 1 until 5; x <- 1 until 5 }
      yield ((y * 10 + x).toLong, y + 0.5, x + 0.5))
      .toDF("id", "lat", "lon")
    val grid = Spatial.radiusJoinGrid(probes, "id", stations, "station_id",
        radiusKm = 150.0, cellDeg = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = probes.crossJoin(
        stations.select(col("station_id"), col("lat").as("s_lat"),
          col("lon").as("s_lon")))
      .withColumn("d", Spatial.haversineKm(col("lat"), col("lon"),
        col("s_lat"), col("s_lon")))
      .filter(round(col("d"), 6) <= 150.0)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("station_id"))).toSet
    assert(grid === brute)
    assert(grid.nonEmpty)
  }
}
