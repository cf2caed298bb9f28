package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val build =
    Seq((1L, "a"), (3L, "b"), (5L, "c")).toDF("bk", "bval")
  private lazy val probe =
    (1L to 100L).map(i => (i, i * 10)).toDF("pk", "pval")

  test("pruned join result is exactly the exact join (no false negatives)") {
    val pruned = BloomPrune.prunedEquiJoin(probe, build, "pk", "bk", 1000L)
      .select("pk", "pval", "bval").collect().map(_.toSeq).toSet
    val exact = probe.join(build, col("pk") === col("bk"))
      .select("pk", "pval", "bval").collect().map(_.toSeq).toSet
    assert(pruned === exact)
    assert(exact.size === 3)
  }

  test("empty build side yields the empty exact-join result, not a crash") {
    val empty = build.filter(col("bk") < 0)
    assert(BloomPrune.prunedEquiJoin(probe, empty, "pk", "bk", 1000L).count() === 0L)
  }

  test("the might_contain reject sits on the probe side, below the join") {
    // File-scan probe side on purpose: a LocalRelation probe gets its
    // filter EVALUATED at optimization time (ConvertToLocalRelation),
    // which proves correctness but leaves no FilterExec to inspect.
    val sf = "/root/testdata/sf0.001"
    val probeFile = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    val buildSmall = graft.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plan = BloomPrune.prunedEquiJoin(
        probeFile, buildSmall, "l_orderkey", "o_orderkey", 100000L)
      .queryExecution.sparkPlan
    val joinChildren = plan.collectFirst {
      case j: BroadcastHashJoinExec => j.children
      case j: SortMergeJoinExec     => j.children
      case j: ShuffledHashJoinExec  => j.children
    }
    assert(joinChildren.isDefined, "no equi-join in the plan")
    val probeSideFilters = joinChildren.get.flatMap(_.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    })
    assert(probeSideFilters.nonEmpty,
      "bloom might_contain filter not below the join (prune would ride the shuffle)")
  }

  test("filter keeps all members and rejects (nearly) all non-members") {
    val bf = BloomPrune.bloomOf(build, "bk", 1000L, fpp = 0.001)
    val kept = probe.filter(BloomPrune.mightContain(bf, col("pk")))
      .select("pk").as[Long].collect().toSet
    assert(Set(1L, 3L, 5L).subsetOf(kept), "false negative — impossible for Bloom")
    assert(kept.size <= 10, s"fpp 0.001 on 97 non-members kept ${kept.size - 3} extras")
  }

  test("preconditions fail fast") {
    intercept[IllegalArgumentException](BloomPrune.bloomOf(build, "bk", 0L))
    intercept[IllegalArgumentException](BloomPrune.bloomOf(build, "bk", 10L, fpp = 1.5))
  }
}
