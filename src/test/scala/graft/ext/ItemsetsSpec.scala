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

  test("associationRules: both directions, hand confidence and lift") {
    // 4 docs; a in {1,2,3}, b in {1,2,4}; pair {a,b} in {1,2}.
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "a x"), (4L, "b y"))
      .toDF("id", "text")
    val out = Itemsets.associationRules(docs, "id", "text", minSupport = 2L)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) -> r).toMap
    assert(out.keySet === Set(("a", "b"), ("b", "a")))
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("pair_df") === 2L)
    assert(ab.getAs[Long]("df_a") === 3L && ab.getAs[Long]("df_c") === 3L)
    assert(ab.getAs[Double]("confidence") === new java.math.BigDecimal(2.0 / 3.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    // lift = 2*4/(3*3)
    assert(ab.getAs[Double]("lift") === new java.math.BigDecimal(8.0 / 9.0)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    // symmetric pair: same lift, same confidence here (equal dfs)
    assert(out(("b", "a")).getAs[Double]("lift") ===
      ab.getAs[Double]("lift"))
  }

  test("associationRules: independence has lift 1") {
    // a and b co-occur exactly as independence predicts:
    // df_a = df_b = 2, pair = 1, n = 4 -> lift = 1*4/(2*2) = 1.
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "b"), (4L, "z"))
      .toDF("id", "text")
    val out = Itemsets.associationRules(docs, "id", "text", minSupport = 1L)
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) -> r.getAs[Double]("lift")).toMap
    assert(out(("a", "b")) === 1.0)
  }
}
