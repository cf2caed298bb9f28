package graft.ext

import graft.SparkTestBase

class BpeLearnSpec extends SparkTestBase {

  import spark.implicits._

  // "aaab aaab ab" → dictionary {a a a b: 2, a b: 1}. Hand-run:
  //   round 1: (a,a)=4 beats (a,b)=3 → "aa a b"/"a b"
  //            (greedy left-to-right: the FIRST a-pair merges, same as
  //            the sentinel replace)
  //   round 2: (a,b)=3 beats (aa,a)=2 → "aa ab"/"ab"
  //   round 3: (aa,ab)=2             → "aaab"/"ab"
  //   round 4: no adjacent pairs left → learner stops early
  private def corpus = Seq("aaab aaab ab").toDF("text")

  test("learnMerges reproduces the hand-run merge sequence and stops when dry") {
    val got = BpeLearn.learnMerges(corpus, "text", k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)))
  }

  test("frequency ties break lexicographically") {
    // "ab cd ab cd": (a,b)=2 and (c,d)=2 tie → (a,b) first.
    val got = BpeLearn.learnMerges(Seq("ab cd ab cd").toDF("text"), "text", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("a", "b"), ("c", "d")))
  }

  test("compression accounts every word occurrence, before and after") {
    val row = BpeLearn.compression(corpus, "text",
      Seq(("a", "a"), ("a", "b"), ("aa", "ab"))).head()
    // 3 word occurrences; 4+4+2 = 10 chars before; aaab/aaab/ab → 3 tokens
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((3L, 3L, 10L)))
  }
}
