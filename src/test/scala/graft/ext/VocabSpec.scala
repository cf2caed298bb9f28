package graft.ext

import graft.SparkTestBase

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b x y"),
    (3L, "a z")
  ).toDF("id", "text")

  test("buildVocab: top-V by occurrence, lexicographic tiebreak") {
    val got = Vocab.buildVocab(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // a=5, b=3, then c/x/y/z all =1 -> 'c' wins the tie
    assert(got === List(("a", 5L), ("b", 3L), ("c", 1L)))
  }

  test("buildVocab plans a bounded top-k, not a full sort shuffle") {
    val plan = Vocab.buildVocab(docs, "text", 3)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was: $plan")
  }

  test("oovStats: per-doc token and OOV counts against the vocab") {
    val vocab = Vocab.buildVocab(docs, "text", 2) // {a, b}
    val got = Vocab.oovStats(docs, "id", "text", vocab)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      1L -> ((6L, 1L, 0.166667)), // c
      2L -> ((4L, 2L, 0.5)),      // x y
      3L -> ((2L, 1L, 0.5))))     // z
  }

  test("goodTuring reads the frequency spectrum") {
    // tokens: a a a b b c d -> N=7 V=4, hapax {c,d} n1=2, dis {b} n2=1
    val df = Seq((1L, "a a a b b"), (2L, "c d")).toDF("id", "text")
    val r = Vocab.goodTuring(df, "text").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((7L, 4L, 2L, 1L)))
    assert(r.getDouble(4) === BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(5) === 1.0, "r1* = 2*n2/n1 = 2/2")
  }

  test("goodTuring with no hapaxes reports zero unseen mass") {
    val df = Seq((1L, "a a b b")).toDF("id", "text")
    val r = Vocab.goodTuring(df, "text").collect().head
    assert(r.getLong(2) === 0L)
    assert(r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === 0.0)
  }

  test("coverageCurve: hand frequencies, clamped sizes, exact masses") {
    // freqs: a=5, b=3, c=1, d=1 (ties break lexicographically).
    val df = Seq((1L, "a a a b c"), (2L, "a a b b d")).toDF("id", "text")
    val rows = Vocab.coverageCurve(df, "text", Seq(1, 2, 10))
      .collect().map(r => r.getAs[Long]("vocab_size") -> r).toMap
    val s1 = rows(1L)
    assert(s1.getAs[Long]("k_actual") === 1L)
    assert(s1.getAs[Long]("covered") === 5L && s1.getAs[Long]("total") === 10L)
    assert(s1.getAs[Double]("coverage") === 0.5)
    assert(rows(2L).getAs[Long]("covered") === 8L)
    // size past the vocabulary clamps to n_types with full coverage
    val s10 = rows(10L)
    assert(s10.getAs[Long]("k_actual") === 4L)
    assert(s10.getAs[Long]("n_types") === 4L)
    assert(s10.getAs[Double]("coverage") === 1.0)
  }

  test("negativeSamplingTable: unigram^0.75 probabilities and cumulation") {
    // freqs: a=5, b=3, c=1, d=1; topV=3 keeps a, b, c (tie -> lexic).
    val df = Seq((1L, "a a a b c"), (2L, "a a b b d")).toDF("id", "text")
    val rows = Vocab.negativeSamplingTable(df, "text", topV = 3)
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    assert(rows.keySet === Set("a", "b", "c"))
    def w9(c: Long) = BigDecimal(math.pow(c.toDouble, 0.75))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val (wa, wb, wc) = (w9(5), w9(3), w9(1))
    val tot = (wa + wb + wc).toDouble
    def d6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows("a").getAs[Double]("p") === d6(wa.toDouble / tot))
    assert(rows("a").getAs[Double]("cum_p") === d6(wa.toDouble / tot))
    assert(rows("b").getAs[Double]("cum_p") ===
      d6((wa + wb).toDouble / tot))
    assert(rows("c").getAs[Double]("cum_p") === 1.0)
  }

  test("coverageCurve is chunk-span invariant") {
    val df = (1 to 50).map(i => (i.toLong, s"w${i % 7} w${i % 3} x"))
      .toDF("id", "text")
    val a = Vocab.coverageCurve(df, "text", Seq(3), chunkSpan = 16L)
      .collect().head.getAs[Double]("coverage")
    val b = Vocab.coverageCurve(df, "text", Seq(3), chunkSpan = 1000L)
      .collect().head.getAs[Double]("coverage")
    assert(a === b)
  }
}
