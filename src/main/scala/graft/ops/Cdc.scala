package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: apply an upsert/delete changelog to a
  * keyed snapshot, and build a type-2 (validity-interval) history from a
  * change stream.
  *
  * Reference scope note: the reference pipeline re-downloads and
  * re-compiles its whole cube on every run (`get-cams-solrad-ts.py`
  * fetches per station-year, `solrad-nc-compiler.py` recompiles from all
  * CSVs). At corpus scale a drop is maintained incrementally — these are
  * the two operators that replace the "recompute everything" loop.
  *
  * Scale shape: [[applyChangelog]] is one keyed window over the changelog
  * (shuffles only the changes, never the base), one anti-join, one
  * union-all — O(base + changes) with the base passing through untouched
  * except for superseded keys. The `row_number <= 1` latest-wins filter
  * is rewritten to the bounded-heap [[graft.plans.TopKPerKey]], so no
  * per-key sort exists in the plan. [[scd2History]] is a single keyed
  * window (lead), one shuffle on the entity key.
  */
object Cdc {

  /** New snapshot = `base` with `changes` applied, latest change per key
    * winning. `changes` must carry every column of `base` plus `seqCol`
    * (a monotone version/sequence; unique per key — commit LSN, batch
    * id) and `opCol` (`"D"` = delete; any other value = upsert). A key's
    * latest `"D"` drops it; a latest upsert replaces the base row or
    * inserts a new one; keys absent from the changelog pass through.
    *
    * If a producer ever violates seq-uniqueness, the winner among tied
    * rows is still DETERMINISTIC (tiebreak on every remaining changelog
    * column) — the result is stable across engines and reruns rather
    * than partition-order-dependent, though which tied row "should" win
    * is the producer's bug to fix.
    */
  def applyChangelog(
      base: DataFrame, changes: DataFrame,
      keys: Seq[String], seqCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyChangelog needs at least one key column")
    val tiebreak = changes.columns.toSeq
      .filterNot(c => keys.contains(c) || c == seqCol)
      .map(c => col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc +: tiebreak: _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 1)
      .drop("__rn")
    val survivors = base.join(latest.select(keys.map(col): _*), keys, "left_anti")
    // null-safe: a NULL op is "any other value" (an upsert). A plain
    // =!= would evaluate NULL on null ops and drop the row from BOTH
    // branches — the key would silently vanish from the snapshot.
    val upserts = latest.filter(!(col(opCol) <=> lit("D")))
      .select(base.columns.toSeq.map(col): _*)
    survivors.unionByName(upserts)
  }

  /** Type-2 history from a change stream: one row per change with
    * `valid_from` = its own `seqCol`, `valid_to` = the key's next change
    * (null while current), `is_current` = no later change exists.
    * `seqCol` must be unique per key for the intervals to be
    * well-defined (dedupe ties upstream).
    */
  def scd2History(changes: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2History needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
  }

  /** Point-in-time (as-of) join of facts onto [[scd2History]]: each fact
    * row picks the dimension version valid at its own time —
    * `valid_from <= t < valid_to` (open-ended current version matches
    * everything after its start). LEFT join: facts before the key's
    * first version (or with no history at all) survive null-padded,
    * which is what a backfill over a younger dimension actually sees.
    *
    * Scale shape: an equi-join on the entity key with the validity
    * range as a join residual — one co-shuffle of facts and history on
    * the key; per-key fan-in is the key's VERSION COUNT, so the match
    * work is facts × versions-per-key, not facts × history. For
    * pathological per-key version counts (millions of versions of one
    * dimension row) the union+window [[AsOfJoin]] spelling bounds the
    * memory instead; at warehouse-normal version counts the residual
    * join is the cheaper plan (no union re-sort of the fact table).
    */
  def pitJoin(facts: DataFrame, history: DataFrame, keys: Seq[String],
      timeCol: String): DataFrame = {
    require(keys.nonEmpty, "pitJoin needs at least one key column")
    val h = keys.foldLeft(history)((d, k) => d.withColumnRenamed(k, s"__h_$k"))
    val equi = keys.map(k => col(k) === col(s"__h_$k")).reduce(_ && _)
    val range = col(timeCol) >= col("valid_from") &&
      (col("valid_to").isNull || col(timeCol) < col("valid_to"))
    facts.join(h, equi && range, "left")
      .drop(keys.map(k => s"__h_$k"): _*)
  }
}
