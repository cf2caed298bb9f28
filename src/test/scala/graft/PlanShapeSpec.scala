package graft

import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Fleet-wide plan-shape guardrail: every driver query's physical plan
  * is checked for the two unambiguous scale-killers —
  *
  *  - `CartesianProductExec`: an unbounded all-pairs join (a broadcast
  *    nested-loop against a bounded side is fine and is what the ANN
  *    baseline plans; the non-broadcast cartesian is never fine);
  *  - `WindowExec` with an empty partition spec: "moving all data to a
  *    single partition" — the round-2 verdict's named scale-killer,
  *    engineered out via keyed windows and ChunkedWindow.
  *
  * Checked on the pre-AQE physical plan (`sparkPlan`), which exposes
  * the full operator tree without executing most queries. Queries
  * whose BUILDER already runs jobs (streams run to completion, sink
  * round-trips) still pass through at the smallest scale factor.
  * This spec is what keeps future queries honest: a regression that
  * reintroduces either shape fails the suite, not a human review.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** A global window is only the scale-killer when its input is the
    * DATA: a WindowExec whose child subtree already passed through a
    * global limit (TakeOrderedAndProject / CollectLimit / GlobalLimit)
    * sees at most k rows by construction — e.g. the rank column over a
    * weighted sample's k winners — and is exempt.
    */
  private def boundedByLimit(p: SparkPlan): Boolean =
    p.collectFirst {
      case t: TakeOrderedAndProjectExec => t
      case l: GlobalLimitExec => l
      case c: CollectLimitExec => c
    }.nonEmpty

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, no unpartitioned window") {
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.sparkPlan
      val cartesians = plan.collect { case c: CartesianProductExec => c }
      assert(cartesians.isEmpty,
        s"$name plans CartesianProductExec — unbounded all-pairs join")
      val globalWindows = plan.collect {
        case w: WindowExec
            if w.partitionSpec.isEmpty && !boundedByLimit(w.child) => w
      }
      assert(globalWindows.isEmpty,
        s"$name plans a single-partition global WindowExec over unbounded input")
      // Safe-alphabet law (round 7, SCALE.md): gate outputs are BIGINT,
      // 6-dp DOUBLE, and strings — raw BOOLEANs render differently
      // under some driver hash compares than under value equality.
      // Only the canary keeps BOOLEAN cells (it exists to PIN the
      // driver environment's rendering of the banned constructs).
      if (name != "q_ext_oracle_canary") {
        val bools = df.schema.fields.filter(
          _.dataType == org.apache.spark.sql.types.BooleanType).map(_.name)
        assert(bools.isEmpty,
          s"$name emits raw BOOLEAN gate column(s) ${bools.mkString(", ")} — " +
            "re-emit as 0/1 BIGINT per the safe-alphabet law")
      }
    }
  }
}
