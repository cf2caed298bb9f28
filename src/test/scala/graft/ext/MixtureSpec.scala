package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(chars: Map[String, Seq[Long]]) =
    chars.toSeq.flatMap { case (s, cs) => cs.map(c => (s, c)) }
      .zipWithIndex.map { case ((s, c), i) => (i.toLong, s, c) }
      .toDF("doc_id", "source", "n_chars")

  test("uniform metric stays exactly uniform") {
    val df = docs(Mixture.Sources.map(_ -> Seq(100L, 100L)).toMap)
    val w = Mixture.multiplicativeWeights(df, "source", col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(w.values.toSet === Set(0.25))
  }

  test("weights sum to 1 and order follows the metric") {
    val df = docs(Map(
      "src0" -> Seq(50L), "src1" -> Seq(100L),
      "src2" -> Seq(200L), "src3" -> Seq(400L)))
    val rows = Mixture.multiplicativeWeights(df, "source", col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val w = rows.map(r => r._1 -> r._3).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-6)
    assert(w("src3") > w("src2") && w("src2") > w("src1") &&
      w("src1") > w("src0"),
      s"MW must upweight above-average domains: $w")
    // e_micro is the exact integer mean in micro-units
    assert(rows.find(_._1 == "src0").get._2 === 50L * 1000000L)
  }

  test("partitioning-invariant (one-row expression chain)") {
    val df = docs(Map(
      "src0" -> Seq(10L, 20L, 31L), "src1" -> Seq(5L),
      "src2" -> Seq(7L, 13L), "src3" -> Seq(97L)))
    val a = Mixture.multiplicativeWeights(df, "source", col("n_chars"))
      .orderBy("source").collect().toSeq
    val b = Mixture.multiplicativeWeights(df.repartition(5), "source",
        col("n_chars"))
      .orderBy("source").collect().toSeq
    assert(a === b)
  }

  test("operator runs on an arbitrary (non-gate) domain set") {
    // 3 domains the gate never ships, custom eta/rounds — the operator
    // must not be welded to the q_ext_mix_mw fixture constants
    val df = Seq(
      (1L, "web", 40L), (2L, "web", 60L),
      (3L, "code", 200L), (4L, "books", 100L))
      .toDF("doc_id", "source", "n_chars")
    val rows = Mixture.multiplicativeWeights(df, "source", col("n_chars"),
        sources = Seq("web", "code", "books"), eta = 0.5, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet === Set("web", "code", "books"))
    val w = rows.map(r => r._1 -> r._3).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-6)
    assert(w("code") > w("books") && w("books") > w("web"),
      s"MW must upweight above-average domains: $w")
    // e_micro is still the exact integer mean in micro-units
    assert(rows.find(_._1 == "web").get._2 === 50L * 1000000L)
    // hand-check round 1 for 'code': h = (0.25, 1.0, 0.5), w0 = 1/3 each
    // avg = (0.25 + 1.0 + 0.5) / 3; up_i = (1/3)(1 + 0.5(h_i - avg))
    val h = Seq(0.25, 1.0, 0.5)
    var wts = Seq.fill(3)(1.0 / 3)
    (1 to 2).foreach { _ =>
      val avg = wts.zip(h).map { case (a, b) => a * b }.sum
      val up = wts.zip(h).map { case (wi, hi) => wi * (1.0 + 0.5 * (hi - avg)) }
      wts = up.map(_ / up.sum)
    }
    assert(math.abs(w("code") - math.rint(wts(1) * 1e6) / 1e6) <= 1e-6)
  }
}
