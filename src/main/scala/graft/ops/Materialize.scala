package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-truncation barrier for BOUNDED intermediates (optimization
  * guide §3.3: "very wide unions/joins of many inputs produce enormous
  * plans … materialising an intermediate result (write + read back, or
  * `localCheckpoint`) truncates the plan").
  *
  * The fleet's iterated operators (Bradley-Terry MM rounds, PQ/IVF
  * codebook training feeding encode + LUT + probe, chained prefix
  * scans) reference small derived tables MANY times. Left as lazy
  * lineage, every reference re-inlines the producing subtree: the
  * round-9 plans measured 272 Exchanges / 3562 plan lines for two MM
  * iterations and 186 Exchanges for Kaplan-Meier — task binaries and
  * scheduling grow with the TEXTUAL plan, and duplicated broadcast
  * subtrees re-execute (exchange reuse only dedups byte-identical
  * exchanges).
  *
  * `bounded` materializes the frame once (executor-local checkpoint,
  * memory+disk) and hands lineage-free partitions to every consumer.
  *
  * Contract: callers may only pass frames whose size is BOUNDED by a
  * domain/model constant (an item table, a codebook, a pair-count
  * matrix over a fixed domain, a chunk directory) — never a frame that
  * grows with the corpus. This is a per-query materialization inside
  * the timed region: it computes from the inputs on every invocation,
  * caches nothing across runs, and changes no values — only how many
  * times the producing subtree appears in (and is executed from) the
  * consuming plan.
  */
object Materialize {

  /** Truncate lineage under a bounded derived frame. Idempotent: a
    * frame that is already a materialized scan (its logical plan is a
    * leaf — a prior checkpoint, an in-memory relation) passes through
    * unchanged instead of being copied again.
    */
  def bounded(df: DataFrame): DataFrame =
    if (df.queryExecution.logical.children.isEmpty) df
    else df.localCheckpoint()
}
