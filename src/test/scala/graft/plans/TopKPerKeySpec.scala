package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  // deterministic, totally ordered within keys: (key, score, id)
  private lazy val base = spark.range(0, 1000)
    .select(
      ($"id" % 7).as("key"),
      (($"id" * 37) % 1000).as("score"),
      $"id")

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    base.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
  }

  test("window row_number<=k rewrites to TopKPerKey and matches row_number semantics") {
    val df = windowTopK(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopKPerKey"), plan)
    assert(plan.contains("PartialTopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)

    val got = df.select("key", "score", "id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    // expected via plain Scala on the same data
    val rows = base.as[(Long, Long, Long)].collect()
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (key, grp) =>
      grp.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
        .map { case ((_, s, i), r) => (key, s, i, r + 1) }
    }.toSet
    assert(got === expected)
  }

  test("k larger than the group handles short groups; ranks stay dense") {
    val tiny = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L))
      .toDF("key", "score", "id")
      // force a non-local plan so the rewrite has a physical effect
      .repartition(4)
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    val got = tiny.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select("key", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1), (1L, 1L, 2), (2L, 3L, 1)))
  }

  test("cast-rank spelling (rank.cast(long) <= k) also rewrites") {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    val df = base.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopKPerKey"), plan)
    assert(df.groupBy("key").count().select(max("count")).as[Long].head() === 2L)
  }

  test("key-predicate filters push below TopKPerKey; order-column filters stay above") {
    val keyFiltered = windowTopK(3).filter($"key" === 2)
    val optimized = keyFiltered.queryExecution.optimizedPlan
    // the key filter must sit BELOW the TopKPerKey node
    val topk = optimized.collectFirst { case t: TopKPerKey => t }
    assert(topk.isDefined, optimized.toString)
    assert(topk.get.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined, optimized.toString)
    // and the result equals filter-after-topk semantics
    val got = keyFiltered.select("id", "rank").as[(Long, Int)].collect().toSet
    val expected = base.as[(Long, Long, Long)].collect()
      .filter(_._1 == 2).sortBy(r => (-r._2, r._3)).take(3)
      .zipWithIndex.map { case ((_, _, id), r) => (id, r + 1) }.toSet
    assert(got === expected)

    // a filter on the ORDER column must NOT push (it would change group
    // contents and therefore ranks)
    val scoreFiltered = windowTopK(3).filter($"score" > 500)
    val opt2 = scoreFiltered.queryExecution.optimizedPlan
    val topk2 = opt2.collectFirst { case t: TopKPerKey => t }
    assert(topk2.isDefined)
    assert(topk2.get.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, opt2.toString)
  }

  test("global top-k (empty PARTITION BY) plans and runs") {
    val w = Window.orderBy($"score".desc, $"id")
    val df = base.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopKPerKey"), plan)
    val got = df.select("score", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq === Seq(1, 2, 3))
    // global maxima of (id*37)%1000 over 0..999
    val top = base.as[(Long, Long, Long)].collect().map(_._2).sorted.reverse.take(3)
    assert(got.map(_._1).toSeq === top.toSeq)
  }

  test("partial-phase flush: high-cardinality keys stay correct") {
    // every row its own key: the partial map would hold the whole
    // partition; the flush path must still produce rank 1 per key
    val df = spark.range(0, 300000).select($"id".as("key"), ($"id" % 97).as("score"))
    val w = Window.partitionBy("key").orderBy($"score".desc)
    val got = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 1)
    assert(got.queryExecution.executedPlan.toString.contains("FinalTopKPerKey"))
    assert(got.count() === 300000L)
  }

  test("non-row_number ranking windows are left untouched") {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    val df = base.withColumn("rank", rank().over(w)).filter($"rank" <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("unfiltered row_number stays a window") {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    val df = base.withColumn("rank", row_number().over(w))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
  }
}
