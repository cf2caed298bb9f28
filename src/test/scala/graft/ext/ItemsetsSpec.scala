package graft.ext

import graft.SparkTestBase

class ItemsetsSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], support: Long) =
    Itemsets.frequentPairs(docs.toDF("doc_id", "text"), "doc_id", "text", support)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("pair support counts distinct documents; duplicates within a doc collapse") {
    val docs = Seq(
      (1L, "spark data spark data"),  // dup tokens count once
      (2L, "spark data"),
      (3L, "spark rows"))
    val p = pairs(docs, 2L)
    assert(p === Map(("data", "spark") -> 2L))
  }

  test("a-priori: a pair of infrequent singletons can never surface") {
    val docs = Seq(
      (1L, "rare gem common"), (2L, "common stone"), (3L, "common stone"))
    // support 2: 'rare'/'gem' have df 1 -> pruned before pairing.
    val p = pairs(docs, 2L)
    assert(p === Map(("common", "stone") -> 2L))
  }

  test("ordering is canonical (t1 < t2) and support threshold is inclusive") {
    val docs = Seq((1L, "b a"), (2L, "a b"), (3L, "b a c"))
    val p = pairs(docs, 3L)
    assert(p === Map(("a", "b") -> 3L))
  }
}
