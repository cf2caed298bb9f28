package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Chunk boundary rules: exact starts/lengths on hand-derivable sizes,
  * the one-token empty-document convention, full coverage (every token
  * belongs to >= 1 chunk), and overlap accounting.
  */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("window starts, truncation, and overlap are exact") {
    val df = Seq((1L, doc(100)), (2L, doc(40)), (3L, doc(41)), (4L, "")).toDF("id", "text")
    val out = Chunking.chunkTokens(df, "id", "text", chunkSize = 40, stride = 30)
      .select("id", "chunk_ix", "start_tok", "n_tok")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out === Set(
      (1L, 0, 0, 40), (1L, 1, 30, 40), (1L, 2, 60, 40), (1L, 3, 90, 10),
      (2L, 0, 0, 40), (2L, 1, 30, 10),     // start 30 < 40 tokens -> tail chunk
      (3L, 0, 0, 40), (3L, 1, 30, 11),     // 41 tokens -> a second start
      (4L, 0, 0, 1)))                      // empty doc = one empty token
  }

  test("every token is covered when stride <= size") {
    val df = Seq((1L, doc(97))).toDF("id", "text")
    val covered = Chunking.chunkTokens(df, "id", "text", 40, 30)
      .select(explode(sequence(col("start_tok"), col("start_tok") + col("n_tok") - 1)).as("p"))
      .distinct().count()
    assert(covered === 97)
  }

  test("budget: chunked_tokens = sum of window lengths; overlap factor > 1") {
    val df = Seq((1L, doc(100))).toDF("id", "text")
    val b = Chunking.chunkBudget(df, "id", "text", 40, 30).head()
    assert(b.getLong(1) === 4L)
    assert(b.getLong(2) === 130L) // 40+40+40+10
  }
}
