package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}

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
    * unchanged instead of being copied again. The same applies through
    * a chain of DETERMINISTIC row-local operators (Project/Filter) over
    * such a leaf: re-inlining a cheap projection of already-material
    * partitions into two consumers duplicates neither meaningful work
    * nor plan text, so paying a checkpoint job for it (r10 shape:
    * Kaplan-Meier re-checkpointed `perT.withColumn(...)` one job after
    * checkpointing `perT`) is pure overhead. Non-deterministic
    * projections still checkpoint — two inlined copies of those could
    * disagree.
    */
  def bounded(df: DataFrame): DataFrame =
    // the ANALYZED plan, not `.logical`: Spark 4's withColumn leaves an
    // UnresolvedStarWithColumns in the raw plan whose contained
    // unresolved function calls report deterministic=true — resolution
    // is what reveals a rand()/udf projection as non-deterministic
    if (cheapOverLeaf(df.queryExecution.analyzed)) df
    else df.localCheckpoint()

  private def cheapOverLeaf(p: LogicalPlan): Boolean = p match {
    case _ if p.children.isEmpty => true
    case pr: Project =>
      pr.projectList.forall(_.deterministic) && cheapOverLeaf(pr.child)
    case f: Filter => f.condition.deterministic && cheapOverLeaf(f.child)
    case a: SubqueryAlias => cheapOverLeaf(a.child)
    case _ => false
  }
}
