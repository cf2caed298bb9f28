package graft.ext

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Chunking invariants under generated documents (fixed-seed raw
  * ScalaCheck, the PropertySpec pattern): the chunk count is a closed
  * form of the token count, every window's length is min(size,
  * remaining), and with stride ≤ size the windows cover every token.
  */
class ChunkingPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  private val caseGen: Gen[(String, Int, Int)] = for {
    n <- Gen.choose(1, 300)
    toks <- Gen.listOfN(n, Gen.choose('a', 'z').map(_.toString))
    size <- Gen.choose(5, 60)
    stride <- Gen.choose(3, 40)
  } yield (toks.mkString(" "), size, stride)

  test("chunk count closed form, window lengths, and full coverage") {
    samples(caseGen, 20).foreach { case (text, size, stride) =>
      val df = Seq((1L, text)).toDF("id", "text")
      val nTok = text.split("\\s+").length
      val rows = Chunking.chunkTokens(df, "id", "text", size, stride)
        .select("start_tok", "n_tok").as[(Int, Int)].collect()
      assert(rows.length === (nTok - 1) / stride + 1,
        s"size=$size stride=$stride nTok=$nTok")
      rows.foreach { case (s0, l) => assert(l === math.min(size, nTok - s0)) }
      if (stride <= size) {
        val covered = rows.flatMap { case (s0, l) => s0 until (s0 + l) }.toSet
        assert(covered === (0 until nTok).toSet)
      }
    }
  }
}
