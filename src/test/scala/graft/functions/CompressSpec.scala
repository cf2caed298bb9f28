package graft.functions

import graft.SparkTestBase
import graft.ext.TextStats
import org.apache.spark.sql.functions._

class CompressSpec extends SparkTestBase {
  import spark.implicits._

  private def lens(ss: (String, String)*): Map[String, Int] =
    ss.toSeq.toDF("name", "s")
      .select(col("name"), TextStats.deflateLength(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("pinned fixture values (the q_ext_compress_pinned oracle numbers)") {
    val got = lens(
      "a100" -> "a" * 100,
      "ab50" -> "ab" * 50,
      "pangram" -> "the quick brown fox jumps over the lazy dog",
      "digits" -> "0123456789")
    assert(got === Map("a100" -> 6, "ab50" -> 7, "pangram" -> 44, "digits" -> 12),
      "JDK zlib at fixed level changed — re-pin the oracle VALUES too")
  }

  test("repetition compresses below prose; doubling beats 2x") {
    val rep = ("spark " * 60).trim
    val prose = "colorless green ideas sleep furiously while the quick brown fox"
    val got = lens("rep" -> rep, "prose" -> prose,
      "prose2" -> (prose + prose))
    assert(got("rep").toDouble / rep.length <
      got("prose").toDouble / prose.length)
    assert(got("prose2") < 2 * got("prose"),
      "the second copy must encode as a back-reference, not fresh bytes")
  }

  test("compressionRatio is null for empty text and positive otherwise") {
    val got = Seq(("e", ""), ("x", "hello hello hello"))
      .toDF("name", "s")
      .select(col("name"), TextStats.compressionRatio(col("s")).as("r"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("e").isEmpty)
    assert(got("x").exists(_.asInstanceOf[Double] > 0))
  }

  test("null input stays null (UnaryExpression null-safety)") {
    val got = Seq(Some("a"), None).toDF("s")
      .select(TextStats.deflateLength(col("s"))).collect()
    assert(got.count(_.isNullAt(0)) === 1)
  }

  test("multi-byte UTF-8 measures bytes, not chars") {
    // '€' is 3 UTF-8 bytes; deflate of one char must exceed 1 byte and
    // the ratio denominator is octet_length (also 3).
    val got = Seq(("u", "€€€€€€€€€€"))
      .toDF("name", "s")
      .select(TextStats.deflateLength(col("s")).as("n"),
        octet_length(col("s")).as("b")).collect().head
    assert(got.getInt(1) === 30)
    assert(got.getInt(0) > 0 && got.getInt(0) < 30)
  }
}
