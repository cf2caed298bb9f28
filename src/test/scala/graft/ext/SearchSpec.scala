package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),        // tf(apple)=2, short doc
    (2L, "apple cherry cherry cherry"),
    (3L, "banana banana banana banana banana banana"), // long doc
    (4L, "durian fig grape")
  ).toDF("doc_id", "text")

  private def q(pairs: (String, String)*) = pairs.toDF("query_id", "term")

  test("bm25 ranks higher-tf shorter docs first and skips non-matches") {
    val got = Search.bm25TopK(docs, "doc_id", "text", q("qa" -> "apple"), 10)
      .orderBy("rank").collect()
    // docs 1 and 2 both contain apple; doc 1 has tf=2 and is shorter.
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(got.map(_.getLong(2)).toSeq === Seq(1L, 2L))
    assert(got(0).getDouble(3) > got(1).getDouble(3))
  }

  test("bm25 length normalization: same tf, longer doc scores lower") {
    val two = Seq(
      (1L, "apple apple pear"),
      (2L, "apple apple pear pear pear pear pear pear pear pear")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(two, "doc_id", "text", q("qa" -> "apple"), 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L),
      "equal tf must rank the shorter document first")
  }

  test("bm25 multi-term queries sum per-term contributions") {
    val got = Search.bm25TopK(
      docs, "doc_id", "text", q("qm" -> "apple", "qm" -> "cherry"), 10)
      .orderBy("rank").collect()
    // doc 2 matches both terms (cherry tf=3 + apple tf=1) and wins.
    assert(got.head.getLong(1) === 2L)
    assert(got.map(_.getLong(1)).toSet === Set(1L, 2L))
  }

  test("bm25 rarer terms carry more idf weight") {
    val corpus = Seq(
      (1L, "common rare"),
      (2L, "common other"),
      (3L, "common filler"),
      (4L, "common words")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(
      corpus, "doc_id", "text", q("q" -> "common", "q" -> "rare"), 10)
      .orderBy("rank").collect()
    assert(got.head.getLong(1) === 1L, "the doc with the rare term must lead")
  }

  test("bm25 k bounds output per query and ties break on doc id") {
    val dup = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val got = Search.bm25TopK(dup, "doc_id", "text", q("q" -> "x"), 2)
      .orderBy("rank").collect()
    assert(got.length === 2)
    assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("termOverlap counts DISTINCT matched terms, not occurrences") {
    val got = Search.termOverlapTopK(
      docs, "doc_id", "text", q("q" -> "apple", "q" -> "cherry"), 10)
      .orderBy("rank").collect()
    // doc 2 matches both terms (cherry tf=3 must not help beyond the
    // distinct count); docs 1 matches apple only; 3 and 4 match none.
    assert(got.map(_.getLong(1)).toSeq === Seq(2L, 1L))
    assert(got.map(_.getLong(3)).toSeq === Seq(2L, 1L))
  }

  test("rrfFuse: a doc on both lists beats a higher single-list rank") {
    val listA = Seq(("q", 10L, 1L), ("q", 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val listB = Seq(("q", 20L, 1L), ("q", 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(listA, listB), k = 10)
      .orderBy("rank").collect()
    // doc 20: 1/62 + 1/61 ≈ 0.03252; docs 10/30 each on one list only.
    assert(got.map(_.getLong(1)).toSeq === Seq(20L, 10L, 30L))
    assert(got.head.getLong(4) === 2L, "n_lists records the fusion support")
    val expect = BigDecimal(1.0 / 62).setScale(10, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(1.0 / 61).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(got.head.getDouble(3) -
      expect.setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("rrfFuse rank ties break on doc id") {
    val listA = Seq(("q", 5L, 1L), ("q", 3L, 1L)).toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(listA), k = 10).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(3L, 5L))
  }
}
