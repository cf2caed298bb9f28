package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT order statistics at scale — the k-th smallest value per key
  * WITHOUT buffering values. The built-in exact `percentile` holds
  * every group's values in the aggregation buffer (fine at gate scale,
  * impossible for a 10¹⁰-row key); the classic alternative is
  * iterative BUCKET REFINEMENT (the distributed selection algorithm —
  * Blum-style rank selection re-expressed as counting passes):
  *
  *   round r: scan rows still inside each key's [lo, hi) bracket,
  *   count them into B equi-width buckets — ONE partial-agg shuffle of
  *   ≤ |keys|·B rows — then walk the (tiny) per-key histogram to find
  *   the bucket holding rank k, and narrow the bracket to it.
  *
  * Each round divides the bracket width by B, so a handful of rounds
  * (log_B of the value spread) brackets the rank into ≤ `resolveCap`
  * rows per key; ONE bounded per-key sort of only those rows resolves
  * the exact value. Per-round executor state is O(B) counters; the
  * driver reads a single scalar per round (the loop-continuation
  * check) — brackets themselves stay distributed and broadcast back.
  *
  * Ties: a bracket that stops shrinking because all its rows carry ONE
  * value (min == max) IS the answer; detected per key and short-
  * circuited, so pathological constant keys terminate in one round.
  */
object ExactSelect {

  /** Exact lower median per key: the (⌊(n+1)/2⌋)-th smallest value.
    * Returns (key, n_rows, median) — `median` is a value FROM the
    * data, never an interpolation.
    */
  def medianExact(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 64, resolveCap: Long = 4096L,
      maxRounds: Int = 12): DataFrame = {
    require(buckets >= 2 && resolveCap >= 1)
    val spark = df.sparkSession
    val data = df.select(col(keyCol).as("k"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // Bracket state per key: remaining rank inside [lo, hi], row count
    // in-bracket, and the constant-bracket short-circuit value.
    var bounds = data.groupBy(col("k"))
      .agg(count(lit(1)).as("n_all"), min(col("v")).as("lo"),
        max(col("v")).as("hi"), count(lit(1)).as("in_cnt"))
      .withColumn("kth", expr("(n_all + 1) div 2")) // lower median rank
      .withColumn("done_v", when(col("lo") === col("hi"), col("lo")))
      .localCheckpoint(true)
    var roundNo = 0
    var unresolved =
      bounds.filter(col("done_v").isNull && col("in_cnt") > resolveCap).count()
    while (unresolved > 0 && roundNo < maxRounds) {
      val open = bounds.filter(col("done_v").isNull && col("in_cnt") > resolveCap)
        .select(col("k"), col("lo"), col("hi"), col("kth"), col("in_cnt"))
      val width = (col("hi") - col("lo")) / buckets
      // One counting pass over rows still inside an open bracket.
      val hist = data.join(broadcast(open), Seq("k"))
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy(col("k"),
          least(floor((col("v") - col("lo")) / width), lit(buckets - 1))
            .cast("int").as("b"))
        .agg(count(lit(1)).as("c"),
          min(col("v")).as("bmin"), max(col("v")).as("bmax"))
      // Walk the per-key histogram (≤ B rows each) to the rank bucket.
      val wcum = Window.partitionBy(col("k")).orderBy(col("b"))
      val picked = hist
        .withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("prev", coalesce(lag(col("cum"), 1).over(wcum), lit(0L)))
        .join(broadcast(open.select(col("k"), col("kth"))), Seq("k"))
        .filter(col("cum") >= col("kth") && col("prev") < col("kth"))
        .select(col("k"), col("bmin").as("lo"), col("bmax").as("hi"),
          (col("kth") - col("prev")).as("kth"), col("c").as("in_cnt"),
          when(col("bmin") === col("bmax"), col("bmin")).as("done_v"))
      val closed = bounds.filter(col("done_v").isNotNull ||
        col("in_cnt") <= resolveCap)
      bounds = closed.select(col("k"), col("n_all"), col("lo"), col("hi"),
          col("in_cnt"), col("kth"), col("done_v"))
        .unionByName(picked.join(
          bounds.select(col("k"), col("n_all")), Seq("k"))
          .select(col("k"), col("n_all"), col("lo"), col("hi"),
            col("in_cnt"), col("kth"), col("done_v")))
        .localCheckpoint(true)
      unresolved =
        bounds.filter(col("done_v").isNull && col("in_cnt") > resolveCap).count()
      roundNo += 1
    }
    require(unresolved == 0,
      s"selection did not bracket within $maxRounds rounds")
    // Resolve the ≤ resolveCap survivors per key with one bounded sort.
    val openEnd = bounds.filter(col("done_v").isNull)
      .select(col("k"), col("lo"), col("hi"), col("kth"))
    val wsel = Window.partitionBy(col("k")).orderBy(col("v"))
    val resolved = data.join(broadcast(openEnd), Seq("k"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .withColumn("rn", row_number().over(wsel))
      .filter(col("rn") === col("kth"))
      .select(col("k"), col("v").as("median"))
    val shortCircuit = bounds.filter(col("done_v").isNotNull)
      .select(col("k"), col("done_v").as("median"))
    bounds.select(col("k").as(keyCol), col("n_all").as("n_rows"))
      .join(resolved.unionByName(shortCircuit)
        .withColumnRenamed("k", keyCol), Seq(keyCol))
      .select(col(keyCol), col("n_rows"), round(col("median"), 6).as("median"))
  }
}
