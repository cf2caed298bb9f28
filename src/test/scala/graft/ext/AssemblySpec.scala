package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AssemblySpec extends SparkTestBase {
  import spark.implicits._

  private def conv(df: org.apache.spark.sql.DataFrame,
                   gapSec: Long = 100L, maxTurns: Int = 8) =
    Assembly.conversations(df, "user", col("sec"), col("eid"),
      col("et"), gapSec, maxTurns)

  test("conversations split on gaps and order turns by (time, seq)") {
    val df = Seq(
      // user 1, session 0: two turns, out-of-seq arrival order
      (1L, 10L, 2L, "b"),
      (1L, 10L, 1L, "a"),
      (1L, 50L, 3L, "c"),
      // gap > 100 -> session 1
      (1L, 500L, 4L, "d"),
      (2L, 10L, 5L, "x")
    ).toDF("user", "sec", "eid", "et")
    val got = conv(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(5), r.getLong(6))))
      .toMap
    assert(got((1L, 0L)) === ((3L, "a#1 b#2 c#3", 0L)),
      "same-second turns must order by seq id")
    assert(got((1L, 1L)) === ((1L, "d#4", 0L)))
    assert(got((2L, 0L)) === ((1L, "x#5", 0L)))
  }

  test("conversations truncate to maxTurns but keep the full count") {
    val df = (1 to 5).map(i => (1L, i.toLong, i.toLong, "t"))
      .toDF("user", "sec", "eid", "et")
    val got = conv(df, gapSec = 100L, maxTurns = 3).collect().head
    assert(got.getLong(2) === 5L, "n_turns reports the UNtruncated length")
    assert(got.getString(5) === "t#1 t#2 t#3")
    assert(got.getLong(6) === 1L)
    assert(got.getLong(3) === 1L && got.getLong(4) === 5L,
      "start/end span the whole session, not the kept prefix")
  }

  test("a gap of exactly gapSec does NOT split (strictly-greater rule)") {
    val df = Seq((1L, 0L, 1L, "a"), (1L, 100L, 2L, "b"))
      .toDF("user", "sec", "eid", "et")
    val got = conv(df, gapSec = 100L).collect()
    assert(got.length === 1 && got.head.getLong(2) === 2L)
  }

  private def prefs(rows: Seq[(Long, Long, String, Double)]) =
    Assembly.preferencePairs(
        rows.toDF("p", "rid", "txt", "score"), "p", "rid", "txt", "score")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(5), r.getString(6))))
      .toMap

  test("preferencePairs picks best vs worst with positive margin") {
    val got = prefs(Seq(
      (1L, 10L, "meh", 2.0), (1L, 11L, "best", 5.0), (1L, 12L, "worst", 1.0),
      (2L, 20L, "only-pair-a", 1.0), (2L, 21L, "only-pair-b", 3.0)))
    assert(got(1L) === ((3L, 11L, "best", 12L, "worst")))
    assert(got(2L) === ((2L, 21L, "only-pair-b", 20L, "only-pair-a")))
  }

  test("preferencePairs: zero-margin prompts are dropped, ties break by id") {
    val got = prefs(Seq(
      // all equal -> no signal -> dropped
      (1L, 10L, "a", 2.0), (1L, 11L, "b", 2.0),
      // top tie at 5.0 -> larger id chosen; bottom tie at 1.0 -> smaller id
      (2L, 20L, "t1", 5.0), (2L, 21L, "t2", 5.0),
      (2L, 22L, "b1", 1.0), (2L, 23L, "b2", 1.0)))
    assert(!got.contains(1L))
    assert(got(2L) === ((4L, 21L, "t2", 22L, "b1")))
  }

  test("preferencePairs: a single-candidate prompt emits nothing") {
    assert(prefs(Seq((1L, 10L, "solo", 4.0))).isEmpty)
  }

  private def corrupt(text: String, rateHex: String) =
    Assembly.spanCorrupt(
      Seq((7L, text)).toDF("id", "text"), "id", "text",
      spanLen = 3, rateHex = rateHex, salt = "t")
      .collect().head

  test("spanCorrupt with rate 0 masks nothing and re-joins block text") {
    val r = corrupt("a b c d e f g h", "00000000")
    assert(r.getString(1) === "a b c d e f g h", "input re-joins untouched")
    assert(r.getString(2) === "")
    assert(r.getLong(3) === 0L)
    assert(r.getLong(4) === 3L, "8 tokens / span 3 -> 3 blocks (last short)")
  }

  test("spanCorrupt with rate ~1 masks every block with indexed sentinels") {
    val r = corrupt("a b c d e f g h", "ffffffff")
    assert(r.getString(1) === "<extra_id_0> <extra_id_1> <extra_id_2>")
    assert(r.getString(2) ===
      "<extra_id_0> a b c <extra_id_1> d e f <extra_id_2> g h",
      "targets carry the masked tokens, short last block included")
    assert(r.getLong(3) === 3L)
  }

  test("spanCorrupt is deterministic: same (id, salt) -> same mask") {
    val a = corrupt("w x y z w x y z w", "80000000")
    val b = corrupt("w x y z w x y z w", "80000000")
    assert(a.getString(1) === b.getString(1))
    assert(a.getString(2) === b.getString(2))
  }

  test("nextEventExamples emits full windows only, in event order") {
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
      (1L, 30L, 102L, "c"), (1L, 40L, 103L, "d"),
      (2L, 10L, 200L, "x"), (2L, 20L, 201L, "y")  // too short for ctx=2
    ).toDF("user", "t", "eid", "label")
    val got = Assembly.nextEventExamples(ev, "user", "t", "eid", "label", 2)
      .orderBy("target_id").collect()
    assert(got.map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq
      === Seq((102L, "a b", "c"), (103L, "b c", "d")),
      "user 1 yields two examples; user 2 is too short and emits none")
  }

  test("nextEventExamples breaks time ties on the event id") {
    val ev = Seq(
      (1L, 10L, 2L, "late"), (1L, 10L, 1L, "early"), (1L, 20L, 3L, "t")
    ).toDF("user", "t", "eid", "label")
    val got = Assembly.nextEventExamples(ev, "user", "t", "eid", "label", 2)
      .collect()
    assert(got.length === 1)
    assert(got.head.getString(2) === "early late")
    assert(got.head.getString(3) === "t")
  }
}
