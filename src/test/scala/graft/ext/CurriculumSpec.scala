package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("phases: exact quartile boundaries, ceil-rank rule") {
    val df = (1L to 8L).map(i => (i, i)).toDF("id", "score")
    val got = Curriculum.phases(df, "id", col("score"), nPhases = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // boundaries at ranks ceil(k·8/4) = 2, 4, 6 -> values 2, 4, 6
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 3L, 6L -> 3L, 7L -> 4L, 8L -> 4L))
  }

  test("phases: boundary ties land in the LOWER phase") {
    // six copies of one value + two larger: the tied block must stay
    // together (phase is a function of the VALUE, not of row order)
    val df = (Seq.fill(6)(10L) ++ Seq(20L, 30L)).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("id", "score")
    val got = Curriculum.phases(df, "id", col("score"), nPhases = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(10L) === 1L)
    assert(got(20L) === 4L) // rank 7 > boundary rank 6's value 10
    assert(got(30L) === 4L)
  }

  test("phases: a fractional difficulty column is REJECTED, not truncated") {
    val df = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      Curriculum.phases(df, "id", col("score"), nPhases = 2)
    }
    assert(e.getMessage.contains("integral"))
    // an explicit integer scaling is the sanctioned route
    val ok = Curriculum.phases(df, "id",
        (col("score") * 1000000).cast("long"), nPhases = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ok === Map(1L -> 1L, 2L -> 2L))
  }

  test("phases: result is partitioning-invariant") {
    val df = (1L to 100L).map(i => (i, i % 17)).toDF("id", "score")
    val a = Curriculum.phases(df, "id", col("score"), 4)
      .orderBy("id").collect().toSeq
    val b = Curriculum.phases(df.repartition(7), "id", col("score"), 4)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
