package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify rows between two versions of a keyed table
  * as added / removed / changed — the change-detection pass a corpus
  * pipeline runs when a new drop replaces an old one (what entered,
  * what left, what was edited), and the input to incremental
  * recomputation downstream.
  *
  * One full-outer join on the key, comparison via null-safe equality
  * on the tracked columns — no collect, no window. At scale the join
  * shuffles both sides by key once; with both snapshots bucketed by
  * the key ([[graft.io.Bucketing]]) it co-locates shuffle-free.
  */
object Diff {

  /** Rows that differ between `oldDf` and `newDf`, keyed by `keyCols`,
    * compared on `compareCols`: (key cols..., change_type) with
    * change_type in {added, removed, changed}. Unchanged rows are not
    * emitted (at corpus scale they are the overwhelming majority).
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__o", lit(1))
    val n = newDf.select((keyCols ++ compareCols).map(c => col(c).as(s"n_$c")): _*)
      .withColumn("__n", lit(1))
    val joinCond = keyCols.map(k => o(k) === n(s"n_$k")).reduce(_ && _)
    val same = compareCols.map(c => o(c) <=> n(s"n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(k => coalesce(o(k), n(s"n_$k")).as(k)) :+ col("change_type"): _*)
  }
}
