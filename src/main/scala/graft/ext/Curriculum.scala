package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curriculum phase assignment — the data-ORDERING step of a training
  * pipeline: once quality/difficulty scores exist (TextStats, the
  * quality model), curriculum learning feeds easy documents first and
  * hard ones later, which needs every doc binned into one of `nPhases`
  * difficulty quartile-style phases. (Bengio et al. 2009 for the
  * training idea; operationally this is "assign each row its exact
  * difficulty-quantile bucket, deterministically, at corpus scale".)
  *
  * Why not `ntile()`: a global ntile is an unpartitioned window — the
  * fleet's named scale-killer. Instead the EXACT phase boundaries are
  * order statistics computed the q_ext_quantile_store way: one
  * partial-agg shuffle to the (difficulty, count) value table (bounded
  * by the score domain, not by rows), the chunked PrefixSum scan for
  * cumulative counts, and the boundary lookup by rank — then the
  * `nPhases - 1` thresholds (a bounded driver collect, the
  * PCA-eigensolve-class exception) come back as plan literals and the
  * phase itself is a row-local expression on the main scan. The data
  * never globally sorts and never shuffles to be phased.
  *
  * Tie rule: phase = 1 + Σ_k [d > t_k] where t_k is the difficulty at
  * rank ceil(k·N/nPhases) — every doc tied with a boundary value lands
  * in the LOWER phase, so the rule is a pure function of the value,
  * never of scan order (oracle-stable under any row order).
  */
object Curriculum {

  /** (id, difficulty, phase) for every input row; `difficulty` must
    * RESOLVE to an integral type (exact order statistics need exact
    * values) — checked, not silently cast: a fractional difficulty
    * truncated by a blind cast("long") would produce plausible but
    * wrong quantile boundaries.
    */
  def phases(
      df: DataFrame, idCol: String, difficulty: Column,
      nPhases: Int): DataFrame = {
    require(nPhases >= 2 && nPhases <= 100,
      s"nPhases must be in [2, 100], got $nPhases")
    val dType = df.select(difficulty.as("__d")).schema.head.dataType
    // match the DataType itself, not simpleString: Spark renders
    // ByteType/ShortType/IntegerType/LongType as tinyint/smallint/int/
    // bigint, so a name allowlist silently rejected valid byte/short
    // difficulty columns (round-9 ADVICE)
    require(dType match {
        case org.apache.spark.sql.types.ByteType
           | org.apache.spark.sql.types.ShortType
           | org.apache.spark.sql.types.IntegerType
           | org.apache.spark.sql.types.LongType => true
        case _ => false
      },
      s"difficulty must resolve to an integral type, got ${dType.simpleString}" +
        " — round or scale fractional scores to integers explicitly first")
    val base = df.select(col(idCol).as("id"), difficulty.cast("long").as("d"))
    val pv = base.groupBy(col("d")).agg(count(lit(1)).as("c"))
    val scanned = graft.ops.PrefixSum.runningTotal(pv, "d", "c", "p", 64L)
      .withColumn("cum", col("p") + col("c"))
    val n = base.agg(count(lit(1)).as("__n"))
    val s = df.sparkSession
    val targets = s.range(1, nPhases).select(col("id").as("k"))
      .crossJoin(broadcast(n))
      // rank of the k-th boundary: ceil(k·N / nPhases), exact integers
      .withColumn("t",
        expr(s"(k * __n + ${nPhases - 1}) DIV $nPhases"))
      .select(col("k"), col("t"))
    // the difficulty value holding rank t — one row per boundary
    val thresholds = scanned
      .join(broadcast(targets), col("cum") >= col("t") && col("p") < col("t"))
      .select(col("k"), col("d").as("td"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phase = (1L until nPhases.toLong).foldLeft(lit(1L)) { (acc, k) =>
      // a missing boundary (empty input) leaves everything in phase 1
      thresholds.get(k) match {
        case Some(td) => acc + when(col("d") > td, 1L).otherwise(0L)
        case None => acc
      }
    }
    base.select(col("id"), col("d").as("difficulty"),
      phase.cast("long").as("phase"))
  }
}
