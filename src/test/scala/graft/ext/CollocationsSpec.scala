package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  test("pmiBigrams: counts and positional marginals on a hand corpus") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val out = Collocations.pmiBigrams(docs, "id", "text", minPairCount = 1L)
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y")) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("c_xy") === 2L)
    assert(ab.getAs[Long]("c_x") === 3L) // "a" starts all 3 bigrams
    assert(ab.getAs[Long]("c_y") === 2L)
    // pmi = ln(2·3/(3·2)) = 0 — and same for (a,c): ln(1·3/(3·1))
    assert(ab.getAs[Double]("pmi") === 0.0)
    assert(out(("a", "c")).getAs[Double]("pmi") === 0.0)
  }

  test("pmiBigrams: punctuation splits and single-token docs vanish") {
    val docs = Seq((1L, "Hello, world!"), (2L, "solo")).toDF("id", "text")
    val out = Collocations.pmiBigrams(docs, "id", "text", minPairCount = 1L)
      .collect()
    assert(out.map(r => (r.getAs[String]("x"), r.getAs[String]("y"))).toSet ===
      Set(("hello", "world")))
  }

  test("chi2TokenClass: perfectly separating token gets chi2 = N") {
    val docs = Seq(
      (1L, "x common", true), (2L, "x common", true),
      (3L, "y common", false), (4L, "y common", false)
    ).toDF("id", "text", "pos")
    val out = Collocations.chi2TokenClass(docs, "id", "text", col("pos"),
        minDf = 1L)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    // a=2,b=0,c=0,d=2 -> chi2 = 4·(4)²/(2·2·2·2) = 4
    assert(out("x").getAs[Double]("chi2") === 4.0)
    assert(out("x").getAs[Long]("pos_assoc") === 1L)
    assert(out("y").getAs[Double]("chi2") === 4.0)
    assert(out("y").getAs[Long]("pos_assoc") === 0L)
    // present in every doc -> association undefined -> null
    assert(out("common").isNullAt(out("common").fieldIndex("chi2")))
  }

  test("llrBigrams: independent pairs score ~0, a locked phrase scores high") {
    // "a b" always adjacent (locked); filler pairs vary. G² of the
    // locked pair must dominate every filler pair's.
    val docs = (1 to 30).map(i =>
      (i.toLong, s"a b c${i % 3} d${i % 5} a b")).toDF("id", "text")
    val out = Collocations.llrBigrams(docs, "id", "text", minPairCount = 1L)
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y")) ->
        r.getAs[Double]("llr")).toMap
    val locked = out(("a", "b"))
    assert(locked > 0.0)
    out.foreach { case (pair, v) =>
      if (pair != (("a", "b"))) assert(v <= locked, s"$pair beat the phrase")
    }
  }

  test("llrBigrams: hand-checked 2x2 G² value") {
    // corpus of bigrams: "a b" twice, "a c", "d b" -> for (a,b):
    // k11=2, k12=1 (a then not-b), k21=1 (not-a then b), k22=0, N=4.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"))
      .toDF("id", "text")
    val out = Collocations.llrBigrams(docs, "id", "text", 1L)
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y")) -> r).toMap
    val r = out(("a", "b"))
    assert(r.getAs[Long]("c_xy") === 2L)
    assert(r.getAs[Long]("c_x") === 3L)
    assert(r.getAs[Long]("c_y") === 3L)
    def xlx(c: Double) = if (c > 0) c * math.log(c) else 0.0
    val expected = 2.0 * (xlx(2) + xlx(1) + xlx(1) + xlx(0)
      - xlx(3) - xlx(1) - xlx(3) - xlx(1) + xlx(4))
    assert(r.getAs[Double]("llr") ===
      new java.math.BigDecimal(expected)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
  }

  test("chi2TokenClass: token presence is distinct per doc") {
    // "x x x" in one doc counts once
    val docs = Seq((1L, "x x x", true), (2L, "z", false)).toDF("id", "text", "p")
    val out = Collocations.chi2TokenClass(docs, "id", "text", col("p"), 1L)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("n_pos")).toMap
    assert(out("x") === 1L)
  }
}
