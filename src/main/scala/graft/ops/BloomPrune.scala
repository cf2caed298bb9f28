package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the explicit form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), for when the build side
  * is known small-ish at authoring time but too large or non-foldable
  * for a broadcast join's row limits.
  *
  * At 100 TB the shape matters: the probe side of a shuffle join pays
  * full shuffle I/O for every row, including the (often vast) majority
  * that match nothing on the build side. A Bloom filter over the build
  * keys is a few hundred KB regardless of probe size; shipping it to
  * the probe scan turns non-matching rows into a codegen'd reject
  * BEFORE the exchange, so shuffle volume scales with the MATCHING
  * probe rows, not the table. Bloom filters have no false negatives,
  * so the pruned join is bit-identical to the exact join (false
  * positives just ride through to the real join predicate) — which is
  * exactly what the DuckDB oracle checks.
  *
  * Both sides hash with the built-in `xxhash64` (seed 42), matching
  * the hash Spark's own runtime filter feeds `BloomFilterAggregate`.
  * The build aggregate runs as its own small job and the resulting
  * blob embeds in the probe plan as a `Literal` — one extra job, the
  * same trade Spark's scalar-subquery filter makes, but deterministic
  * and visible in the plan (`PlanShapeSpec`-friendly) instead of
  * depending on optimizer heuristics firing.
  */
object BloomPrune {

  /** Aggregate `build`'s `key` into a Bloom-filter blob sized for
    * `expectedItems` at `fpp`. Returns null when the build side is
    * empty (a might-contain probe on a null blob is null → filter
    * rejects all — the exact-join result for an empty build side).
    */
  def bloomOf(build: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    // Standard Bloom sizing: m = -n ln(p) / (ln 2)^2 bits.
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val hashed = GraftColumnBridge.expression(xxhash64(col(key)))
    val agg = new BloomFilterAggregate(
      hashed,
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    val row = build.select(GraftColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a driver-built blob: true /
    * false-positive rows pass, definite non-members are rejected in
    * the scan stage, before any exchange.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** Equi-join with the probe side Bloom-pruned on the join key.
    * Result is exactly `probe.join(build, probeKey === buildKey)`;
    * only the probe-side shuffle volume changes.
    */
  def prunedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = bloomOf(build, buildKey, expectedItems, fpp)
    probe.filter(mightContain(bf, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }
}
