package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the r11 pass-through contract of [[Materialize.bounded]]: a
  * deterministic Project/Filter chain over an already-material leaf is
  * returned unchanged (no second checkpoint job), while anything with
  * real work under it — or anything non-deterministic, which two
  * inlined copies could evaluate differently — still checkpoints.
  */
class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("project/filter chain over a checkpointed leaf passes through") {
    val base = Seq((1L, 2L), (3L, 4L)).toDF("a", "b").localCheckpoint()
    val derived = base.withColumn("c", col("a") + col("b")).filter(col("a") > 0)
    assert(Materialize.bounded(base) eq base)
    assert(Materialize.bounded(derived) eq derived)
  }

  test("aggregates and non-deterministic projections still checkpoint") {
    val base = Seq((1L, 2L), (3L, 4L)).toDF("a", "b").localCheckpoint()
    val agg = base.groupBy("a").agg(sum("b").as("s"))
    assert(!(Materialize.bounded(agg) eq agg))
    assert(Materialize.bounded(agg).queryExecution.logical.children.isEmpty)
    val nondet = base.withColumn("r", rand(42))
    assert(!(Materialize.bounded(nondet) eq nondet))
  }
}
