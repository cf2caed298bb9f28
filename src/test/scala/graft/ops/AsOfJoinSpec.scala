package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val left = Seq(
    ("A", 10L, "l1"), ("A", 20L, "l2"), ("A", 30L, "l3"),
    ("B", 10L, "l4") // no right rows for B
  ).toDF("k", "t", "payload")

  private lazy val right = Seq(
    ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 40L, 9.0)
  ).toDF("k", "t", "v")

  test("priorJoin attaches the latest right row at or before each left time") {
    val out = AsOfJoin.priorJoin(left, right, Seq("k"), "t", Seq("v"))
      .orderBy("k", "t").collect()
    assert(out.length === 4)
    assert(out(0).getAs[org.apache.spark.sql.Row]("asof").getDouble(0) === 1.0) // t=10 -> t=5
    assert(out(1).getAs[org.apache.spark.sql.Row]("asof").getDouble(0) === 2.0) // t=20 -> t=20 (inclusive)
    assert(out(2).getAs[org.apache.spark.sql.Row]("asof").getDouble(0) === 2.0) // t=30 -> t=20, not t=40
    assert(out(3).isNullAt(out(3).fieldIndex("asof")))                          // key B: no match
    assert(out(0).getString(2) === "l1") // left payload carried
  }

  test("tolerance nulls stale matches") {
    val out = AsOfJoin.priorJoin(left, right, Seq("k"), "t", Seq("v"),
        toleranceSeconds = Some(5L))
      .orderBy("k", "t").collect()
    assert(out(0).getAs[org.apache.spark.sql.Row]("asof").getDouble(0) === 1.0) // 10-5=5 <= 5
    assert(out(1).getAs[org.apache.spark.sql.Row]("asof").getDouble(0) === 2.0) // 0 <= 5
    assert(out(2).isNullAt(out(2).fieldIndex("asof")))                          // 30-20=10 > 5
  }

  test("plan shape: one window, no join node") {
    val out = AsOfJoin.priorJoin(left, right, Seq("k"), "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"), s"unexpected join node:\n$plan")
  }
}
