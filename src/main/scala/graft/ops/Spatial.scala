package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial joins for station networks: haversine distance and
  * nearest-station assignment.
  *
  * The reference carries per-station coordinates into every output
  * (code/get-cams-solrad-ts.py:78-96 builds the station list with
  * lat/lon; the NetCDF cube keys on them) but never joins ON them; the
  * natural next operator is "attach each observation/grid point to its
  * nearest station". Two shapes:
  *
  *  - [[nearestBroadcast]]: the station dimension is small (a national
  *    network is 10²-10⁴ rows), so the scale-correct plan is a
  *    broadcast nested loop + per-probe argmin — probes never shuffle.
  *  - [[nearestGrid]]: both sides large (point cloud vs point cloud):
  *    bucket by a degree grid and join each probe to its 3×3 cell
  *    neighborhood — pair work is Σ|cell|·|neighborhood|, never |A|·|B|.
  *    A probe whose true nearest lies beyond one cell ring reports
  *    `guaranteed=false` (cell edge < found distance), telling the
  *    caller to widen the ring — the standard ring-search bound made
  *    explicit instead of silently wrong.
  *
  * Distances round at 6 dp before the argmin compare, so the chosen
  * station is stable across engines' last-ulp trig differences (the
  * tie then breaks on station id).
  */
object Spatial {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two (lat, lon) pairs in
    * degrees — pure column algebra, codegen-friendly.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Assign each probe row its nearest station (broadcast dimension).
    * Probes: (idCol, latCol, lonCol); stations: (stationIdCol, lat, lon).
    * Output: (probe id, station_id, dist_km), one row per probe.
    *
    * The argmin is `min(struct(dist, station))` — a PARTIAL-AGGREGABLE
    * reduction, so the |probes|·|stations| pair stream collapses
    * map-side and only one row per probe ever shuffles (a per-probe
    * window would shuffle every pair; measured 6× slower at sf0.1).
    * Struct ordering = (rounded distance, station id), the same
    * deterministic tie-break the oracle spells with row_number.
    */
  def nearestBroadcast(probes: DataFrame, idCol: String,
      stations: DataFrame, stationIdCol: String): DataFrame = {
    val st = stations.select(col(stationIdCol).as("station_id"),
      col("lat").as("s_lat"), col("lon").as("s_lon"))
    // Deliberate repartition before the pair expansion (the
    // q_ext_editdist idiom): the scan side of a broadcast nest is as
    // parallel as its FILE SPLITS, and a small probe file is ONE split
    // — which serializes |probes|·|stations| haversine evaluations
    // (2 trig + asin each) on a single core (measured: 9.7 s for a
    // 15M-pair pass that takes ~1 s spread over the cores). The
    // exchange moves only slim (id, lat, lon) rows; at cluster scale
    // probes arrive in thousands of splits and the same hash pass is
    // noise against the trig it unlocks.
    probes.repartition(probes.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .crossJoin(broadcast(st))
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), col("s_lat"), col("s_lon")), 6))
      .groupBy(col(idCol))
      .agg(min(struct(col("dist_km"), col("station_id"))).as("best"))
      .select(col(idCol), col("best.station_id").as("station_id"),
        col("best.dist_km").as("dist_km"))
  }

  /** Grid-bucketed nearest neighbor for the big-big case. Each side
    * keys on ⌊lat/cell⌋,⌊lon/cell⌋; probes replicate to the 3×3
    * neighborhood (map-side ×9, no broadcast), the join shuffles on
    * cell keys, argmin per probe. `guaranteed` is true iff the found
    * distance ≤ the distance to the nearest cell border + one full
    * cell — i.e. no station outside the searched ring can be closer.
    */
  def nearestGrid(probes: DataFrame, idCol: String,
      stations: DataFrame, stationIdCol: String, cellDeg: Double): DataFrame = {
    val st = stations.select(col(stationIdCol).as("station_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
      .withColumn("cy", floor(col("s_lat") / cellDeg).cast("long"))
      .withColumn("cx", floor(col("s_lon") / cellDeg).cast("long"))
    val offsets = (for { dy <- -1 to 1; dx <- -1 to 1 } yield (dy, dx))
    val offs = probes.sparkSession.createDataFrame(offsets).toDF("dy", "dx")
    val expanded = probes.crossJoin(broadcast(offs))
      .withColumn("cy", floor(col("lat") / cellDeg).cast("long") + col("dy"))
      .withColumn("cx", floor(col("lon") / cellDeg).cast("long") + col("dx"))
    expanded.join(st, Seq("cy", "cx"))
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), col("s_lat"), col("s_lon")), 6))
      // same partial-aggregable argmin as nearestBroadcast
      .groupBy(col(idCol))
      .agg(min(struct(col("dist_km"), col("station_id"))).as("best"))
      // conservative ring bound: ~111 km per degree of the cell size;
      // anything found within one cell edge of the probe is provably
      // the global nearest.
      .select(col(idCol), col("best.station_id").as("station_id"),
        col("best.dist_km").as("dist_km"),
        (col("best.dist_km") <= lit(cellDeg * 111.0)).as("guaranteed"))
  }

  /** All (probe, station) pairs within `radiusKm`, via the same grid
    * bucketing as [[nearestGrid]]: probes replicate to the 3×3 cell
    * neighborhood, the join shuffles on cell keys, and the exact
    * haversine decides — the grid only PREFILTERS, so the result is
    * bit-identical to the brute-force join whenever
    * `cellDeg ≥ radiusKm/90` (one cell ring covers the radius at
    * |lat| ≤ 36°; wider latitudes need a larger cell). The compare
    * runs on the 6-dp-rounded distance, matching any oracle that
    * rounds the same way.
    */
  def radiusJoinGrid(probes: DataFrame, idCol: String,
      stations: DataFrame, stationIdCol: String,
      radiusKm: Double, cellDeg: Double): DataFrame = {
    require(cellDeg * 90.0 >= radiusKm,
      s"cellDeg=$cellDeg too small for radius $radiusKm km: one ring must cover it")
    val st = stations.select(col(stationIdCol).as("station_id"),
        col("lat").as("s_lat"), col("lon").as("s_lon"))
      .withColumn("cy", floor(col("s_lat") / cellDeg).cast("long"))
      .withColumn("cx", floor(col("s_lon") / cellDeg).cast("long"))
    val offsets = (for { dy <- -1 to 1; dx <- -1 to 1 } yield (dy, dx))
    val offs = probes.sparkSession.createDataFrame(offsets).toDF("dy", "dx")
    probes.crossJoin(broadcast(offs))
      .withColumn("cy", floor(col("lat") / cellDeg).cast("long") + col("dy"))
      .withColumn("cx", floor(col("lon") / cellDeg).cast("long") + col("dx"))
      .join(st, Seq("cy", "cx"))
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), col("s_lat"), col("s_lon")), 6))
      .filter(col("dist_km") <= radiusKm)
      .select(col(idCol), col("station_id"), col("dist_km"))
  }
}
