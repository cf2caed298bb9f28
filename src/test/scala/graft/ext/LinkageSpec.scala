package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val recs = Seq(
    // block "b1": a full dup pair + an unrelated member
    (1L, "b1", "alice", "555-1234", 10.0),
    (2L, "b1", "alice", "555-1234", 10.01),
    (3L, "b1", "robert", "555-9999", 500.0),
    // block "b2": alone — can never pair
    (4L, "b2", "alice", "555-1234", 10.0)
  ).toDF("rid", "block", "name", "phone", "bal")

  private def score(pairs: org.apache.spark.sql.DataFrame) = Seq(
    when(col("name_a") === col("name_b"), 6L).otherwise(lit(-3L)),
    when(col("phone_a") === col("phone_b"), 4L).otherwise(lit(-2L)),
    when(abs(col("bal_a") - col("bal_b")) <= 0.02, 2L).otherwise(lit(-1L)))

  test("pairs never cross blocks; ids are ordered") {
    val pairs = Linkage.blockedPairs(recs, "rid", Seq("block"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("classify: weighted score, thresholds, review band") {
    val pairs = Linkage.blockedPairs(recs, "rid", Seq("block"))
    val got = Linkage.classify(pairs, score(pairs), matchMin = 10L, possibleMin = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    // (1,2): 6+4+2 = 12 -> match; (1,3)/(2,3): -3-2-1 = -6 -> excluded
    assert(got === Map((1L, 2L) -> ((12L, "match"))))
  }

  test("possible band sits between the thresholds") {
    val partial = Seq(
      (1L, "b", "alice", "555-1234", 10.0),
      (2L, "b", "alicia", "555-1234", 99.0)   // phone agrees, rest differ
    ).toDF("rid", "block", "name", "phone", "bal")
    val pairs = Linkage.blockedPairs(partial, "rid", Seq("block"))
    val got = Linkage.classify(pairs, score(pairs), matchMin = 10L, possibleMin = 0L)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq((0L, "possible"))) // -3+4-1 = 0
  }

  test("maxBlock caps a hot block by id rank — overflow rows never pair") {
    val hot = (1L to 6L).map(i => (i, "hot", s"n$i", s"p$i", i.toDouble))
      .toDF("rid", "block", "name", "phone", "bal")
    val pairs = Linkage.blockedPairs(hot, "rid", Seq("block"), maxBlock = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the 3 lowest ids survive the cap -> C(3,2) pairs
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
