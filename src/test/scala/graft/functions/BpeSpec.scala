package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("encode applies merges in rank order, exhaustively, per word") {
    // hand-derived under the pinned table (see VerifyFixtures.bpeFixture)
    assert(Bpe.encode("the").toSeq === Seq(28))
    assert(Bpe.encode("thin father").toSeq === Seq(27, 29, 6, 1, 28, 18))
    assert(Bpe.encode("standing at the station").toSeq ===
      Seq(35, 31, 34, 36, 28, 35, 36, 9, 15, 14))
    assert(Bpe.encode("interesting").toSeq === Seq(29, 20, 33, 5, 35, 34))
  }

  test("unknown characters map to UNK, whitespace never produces tokens") {
    assert(Bpe.encode("qzx7").toSeq === Seq(17, 26, 24, 0))
    assert(Bpe.encode("  the   the  ").toSeq === Seq(28, 28))
    assert(Bpe.encode("").toSeq === Seq.empty)
    assert(Bpe.encode("   ").toSeq === Seq.empty)
  }

  test("merges never cross word boundaries") {
    // "t h" must NOT merge to th across the space
    assert(Bpe.encode("t h").toSeq === Seq(20, 8))
  }

  test("the expression matches the driver-side encoder and stays codegen'd") {
    // repartition blocks ConvertToLocalRelation from folding the whole
    // projection driver-side, so the expression actually runs in codegen
    val df = Seq((1L, "standing at the station"), (2L, "qzx7"), (3L, ""))
      .toDF("id", "text")
      .repartition(2)
      .select(col("id"), Bpe.bpeEncode(col("text")).as("ids"))
    // collect() runs df's OWN QueryExecution, finalizing the adaptive
    // plan so the codegen check below sees the executed shape
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Bpe.encode("standing at the station").toSeq)
    assert(got(2L) === Seq(17, 26, 24, 0))
    assert(got(3L) === Seq.empty)
    // the `*(n)` prefix marks a WholeStageCodegen span in plan rendering;
    // the Project carrying bpe_encode must sit inside one (no fallback)
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.linesIterator.exists(l =>
      l.contains("*(") && l.contains("bpe_encode")),
      s"bpe_encode fell out of codegen:\n$plan")
  }

  test("vocab ids are stable: base chars 1..26, merges 27+") {
    assert(Bpe.vocab("a") === 1 && Bpe.vocab("z") === 26)
    assert(Bpe.vocab("th") === 27 && Bpe.vocab("at") === 36)
    assert(Bpe.vocab.size === 36)
  }

  test("decode inverts encode up to whitespace; unknown ids -> U+FFFD") {
    assert(Bpe.decode(Bpe.encode("the cat")) === "thecat")
    assert(Bpe.decode(Bpe.encode("standing at the station")) ===
      "standingatthestation")
    assert(Bpe.decode(Array(27, 0, 99)) === "th��",
      "UNK and out-of-range ids both decode as the replacement char")
    assert(Bpe.decode(Array.empty[Int]) === "")
  }

  test("bpeDecode expression round-trips through the DataFrame path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("in the end", "zz").toDF("t")
      .select(Bpe.bpeDecode(Bpe.bpeEncode(col("t")))).as[String].collect()
    assert(got.toSeq === Seq("intheend", "zz"))
  }
}
