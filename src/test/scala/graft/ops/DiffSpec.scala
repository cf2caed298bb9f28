package graft.ops

import graft.SparkTestBase

class DiffSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed; unchanged is silent") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null: String))
      .toDF("id", "v")
    val newDf = Seq((2L, "b"), (3L, "C"), (4L, null: String), (5L, "e"))
      .toDF("id", "v")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("id"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
    // 2 unchanged, 4 null==null unchanged (null-safe compare)
  }

  test("multi-column keys and no compare columns (presence diff only)") {
    val oldDf = Seq((1L, "x", 9)).toDF("k1", "k2", "n")
    val newDf = Seq((1L, "x", 9), (1L, "y", 9)).toDF("k1", "k2", "n")
    val got = Diff.snapshotDiff(oldDf, newDf, Seq("k1", "k2"), Nil)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getString(2))).toMap
    assert(got === Map((1L, "y") -> "added"))
  }
}
