package graft.ext

import graft.SparkTestBase

class LangModelSpec extends SparkTestBase {

  import spark.implicits._

  private def r(x: Double, scale: Int) =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed add-one unigram scores, OOV at the smoothing floor") {
    // train tokens: a,a,b + a,b -> c(a)=3, c(b)=2, N=5, V=2
    val train = Seq((1L, "a a b"), (2L, "a b")).toDF("id", "text")
    val docs = train.unionByName(Seq((3L, "c")).toDF("id", "text"))
    val got = LangModel.scoreUnigram(docs, "id", "text", train)
      .collect().map(row =>
        row.getLong(0) -> ((row.getLong(1), row.getLong(2), row.getDouble(3)))).toMap
    val lnA = r(math.log(4.0 / 7), 8)   // (3+1)/(5+2)
    val lnB = r(math.log(3.0 / 7), 8)   // (2+1)/(5+2)
    val floor = r(math.log(1.0 / 7), 8)
    assert(got(1L) === ((3L, 0L, r((2 * lnA + lnB) / 3, 6))))
    assert(got(2L) === ((2L, 0L, r((lnA + lnB) / 2, 6))))
    assert(got(3L) === ((1L, 1L, r(floor, 6))))
  }

  test("clean in-vocab prose outscores OOV gibberish (the filter's point)") {
    val train = (1L to 50L).map(i => (i, "the quick brown fox jumps")).toDF("id", "text")
    val docs = Seq((900L, "the quick brown fox"), (901L, "zxq qqv jjx wwz"))
      .toDF("id", "text")
    val scores = LangModel.scoreUnigram(docs, "id", "text", train)
      .collect().map(row => row.getLong(0) -> row.getDouble(3)).toMap
    assert(scores(900L) > scores(901L))
  }

  test("bigram interpolation matches the hand recurrence; unseen grams floor") {
    // train "a b a b": c(a)=2 c(b)=2, N=4 V=2; c12("a b")=2, c12("b a")=1
    val train = Seq((1L, "a b a b")).toDF("id", "text")
    val docs = Seq((9L, "a b c")).toDF("id", "text")
    val got = LangModel.scoreBigramInterpolated(docs, "id", "text", train, 0.5)
      .collect().head
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    // "a b": p_bi=(2+1)/(2+2)=0.75, p_uni(b)=(2+1)/(4+2)=0.5 -> mix 0.625
    // "b c": p_bi=(0+1)/(2+2)=0.25 (unseen gram), p_uni(c)=(0+1)/6 -> mix
    val lp1 = r8(math.log(0.5 * 0.75 + 0.5 * 0.5))
    val lp2 = r8(math.log(0.5 * 0.25 + 0.5 * (1.0 / 6)))
    val want = ((lp1 + lp2) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got.getLong(1) === 2L, "two bigram positions")
    assert(got.getLong(2) === 1L, "one unseen gram")
    assert((BigDecimal(got.getDouble(3)) - want).abs <= BigDecimal("0.000001"))
  }

  test("word order moves the bigram score where the unigram model is blind") {
    val train = (1L to 30L).map(i => (i, "the cat sat on the mat")).toDF("id", "text")
    val docs = Seq((1L, "the cat sat"), (2L, "sat the cat"), (3L, "cat the sat"))
      .toDF("id", "text")
    val got = LangModel.scoreBigramInterpolated(docs, "id", "text", train, 0.7)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > got(2L) && got(1L) > got(3L),
      "in-order text must outscore its permutations")
  }

  test("a single-token document emits no bigram row") {
    val train = Seq((1L, "a b")).toDF("id", "text")
    val docs = Seq((9L, "a")).toDF("id", "text")
    assert(LangModel.scoreBigramInterpolated(docs, "id", "text", train, 0.5)
      .count() === 0L)
  }

  test("Kneser-Ney bigram: hand-computed probabilities, discounting, skips") {
    // train "a b a c a b": bigrams ab:2 ba:1 ac:1 ca:1; N_types = 4
    // ctx  a: c1=3 nf=2 | b: c1=1 nf=1 | c: c1=1 nf=1
    // cont b: np=1      | a: np=2      | c: np=1
    val train = Seq((1L, "a b a c a b")).toDF("id", "text")
    val docs = Seq(
      (10L, "a b"),   // seen gram: (2-.75)/3 + (.75*2/3)*(1/4)
      (11L, "b c"),   // unseen gram, seen parts: 0 + (.75*1/1)*(1/4)
      (12L, "z a")    // w1 never a context -> skipped, null avg
    ).toDF("id", "text")
    val got = LangModel.scoreBigramKneserNey(docs, "id", "text", train)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_skipped"),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val p10 = (2.0 - 0.75) / 3.0 + ((0.75 * 2) / 3.0) * (1.0 / 4.0)
    val p11 = 0.0 + ((0.75 * 1) / 1.0) * (1.0 / 4.0)
    def expect(p: Double): Double =
      BigDecimal(BigDecimal(math.log(p)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._1 === 1L && got(10L)._2 === 0L)
    assert(math.abs(got(10L)._3.get - expect(p10)) <= 1e-9)
    assert(math.abs(got(11L)._3.get - expect(p11)) <= 1e-9)
    // the discount moved mass: seen gram scores higher than backoff-only
    assert(got(10L)._3.get > got(11L)._3.get)
    assert(got(12L) === ((1L, 1L, None)))
  }
}
