package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrAggSpec extends SparkTestBase {

  import spark.implicits._

  private def rows(r: (String, java.lang.Double)*): DataFrame =
    r.toDF("k", "v")

  private def full(df: DataFrame) =
    IncrAgg.view(IncrAgg.state(df, Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().toSeq

  private def folded(hist: DataFrame, batch: DataFrame) =
    IncrAgg.view(
      IncrAgg.merge(IncrAgg.state(hist, Seq("k"), "v"), batch, Seq("k"), "v"),
      Seq("k")).orderBy("k").collect().toSeq

  test("fold(state, batch) is bit-identical to a from-scratch recompute") {
    val hist = rows(("a", 1.5), ("a", 2.25), ("b", -3.0))
    val batch = rows(("a", 10.0), ("c", 0.125), ("b", 4.5))
    assert(folded(hist, batch) === full(hist.unionByName(batch)))
  }

  test("keys only in state or only in batch both survive the merge") {
    val hist = rows(("old", 1.0))
    val batch = rows(("new", 2.0))
    val out = folded(hist, batch).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("old" -> 1L, "new" -> 1L))
  }

  test("empty batch is a no-op; empty state adopts the batch") {
    val hist = rows(("a", 1.0), ("a", 3.0))
    val none = rows()
    assert(folded(hist, none) === full(hist))
    assert(folded(none, hist) === full(hist))
  }

  test("null values: count skips them, min/max ignore them") {
    val hist = rows(("a", 2.0), ("a", null))
    val batch = rows(("a", null), ("a", 6.0))
    val r = folded(hist, batch).head
    assert(r.getLong(1) === 2)            // n counts non-null only
    assert(r.getDouble(2) === 8.0)        // sum
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 6.0)
  }

  test("repeated folding matches one big fold (associativity in practice)") {
    val parts = Seq(
      rows(("a", 1.0), ("b", 2.0)), rows(("a", 0.5)), rows(("c", -1.0), ("a", 7.75)))
    val steps = parts.tail.foldLeft(IncrAgg.state(parts.head, Seq("k"), "v")) {
      (st, b) => IncrAgg.merge(st, b, Seq("k"), "v")
    }
    assert(IncrAgg.view(steps, Seq("k")).orderBy("k").collect().toSeq ===
      full(parts.reduce(_ unionByName _)))
  }
}
