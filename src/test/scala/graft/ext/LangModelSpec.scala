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
}
