package graft.ops

import graft.SparkTestBase

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  test("applyChangelog: latest wins, deletes drop, inserts appear, untouched pass") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "src", "n")
    val changes = Seq(
      (2L, "b", 21L, 1L, "U"),  // superseded by the seq=2 delete
      (2L, "b", 22L, 2L, "D"),
      (3L, "c", 33L, 1L, "U"),
      (4L, "d", 40L, 1L, "I"),
      (4L, "d", 44L, 2L, "U")   // latest insert-then-update wins
    ).toDF("id", "src", "n", "seq", "op")
    val got = Cdc.applyChangelog(base, changes, Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 10L, 3L -> 33L, 4L -> 44L))
  }

  test("applyChangelog: delete then re-insert at a later seq resurrects the key") {
    val base = Seq((1L, "a", 1L)).toDF("id", "src", "n")
    val changes = Seq(
      (1L, "a", 0L, 1L, "D"),
      (1L, "a", 9L, 2L, "I")
    ).toDF("id", "src", "n", "seq", "op")
    val got = Cdc.applyChangelog(base, changes, Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 9L))
  }

  test("applyChangelog: latest-wins filter is rewritten to TopKPerKey (no per-key sort)") {
    val base = Seq((1L, "a", 1L)).toDF("id", "src", "n")
    val changes = Seq((1L, "a", 2L, 1L, "U")).toDF("id", "src", "n", "seq", "op")
    val plan = Cdc.applyChangelog(base, changes, Seq("id"), "seq", "op")
      .queryExecution.optimizedPlan
    val hasTopK = plan.collect {
      case n if n.getClass.getSimpleName.contains("TopKPerKey") => n
    }.nonEmpty
    assert(hasTopK, s"expected TopKPerKey in: $plan")
  }

  test("applyChangelog: NULL op is an upsert, never a silent delete") {
    val base = Seq((1L, "a", 10L)).toDF("id", "src", "n")
    val changes = Seq((1L, "a", 99L, 1L, null: String))
      .toDF("id", "src", "n", "seq", "op")
    val got = Cdc.applyChangelog(base, changes, Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 99L))
  }

  test("scd2History: contiguous validity intervals, one current row per key") {
    val ch = Seq(
      ("u1", 100L, "v1"), ("u1", 200L, "v2"), ("u1", 300L, "v3"),
      ("u2", 150L, "w1")
    ).toDF("k", "seq", "attr")
    val got = Cdc.scd2History(ch, Seq("k"), "seq")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
      .toSet
    assert(got === Set(
      ("u1", "v1", 100L, Some(200L), 0L),
      ("u1", "v2", 200L, Some(300L), 0L),
      ("u1", "v3", 300L, None, 1L),
      ("u2", "w1", 150L, None, 1L)))
  }

  test("pitJoin: each fact picks the version valid at its time; " +
      "pre-history and unknown keys survive null-padded") {
    val hist = Cdc.scd2History(Seq(
      ("u1", 100L, "v1"), ("u1", 200L, "v2"), ("u1", 300L, "v3"),
      ("u2", 150L, "w1")
    ).toDF("k", "seq", "attr"), Seq("k"), "seq")
    val facts = Seq(
      (1L, "u1", 100L),  // exactly at v1 start -> v1
      (2L, "u1", 199L),  // inside v1
      (3L, "u1", 200L),  // boundary: v1 closes at 200, v2 opens -> v2
      (4L, "u1", 999L),  // open-ended current -> v3
      (5L, "u1", 50L),   // before first version -> null
      (6L, "u3", 500L)   // no history at all -> null
    ).toDF("fid", "k", "t")
    val got = Cdc.pitJoin(facts, hist, Seq("k"), "t")
      .select("fid", "attr").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set(
      (1L, Some("v1")), (2L, Some("v1")), (3L, Some("v2")),
      (4L, Some("v3")), (5L, None), (6L, None)))
  }
}
