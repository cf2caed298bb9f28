package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  test("kAnonymity: counts violating groups and at-risk rows") {
    // QI groups of sizes 1, 2, 3 with k=3 -> two violating, 3 rows at risk
    val df = Seq(("a", 1), ("b", 1), ("b", 2), ("c", 1), ("c", 2), ("c", 3))
      .toDF("qi", "x")
    val r = Privacy.kAnonymity(df, Seq("qi"), k = 3L).collect().head
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_violating") === 2L)
    assert(r.getAs[Long]("n_rows_at_risk") === 3L)
    assert(r.getAs[Double]("suppression_rate") === 0.5)
  }

  test("kAnonymity: fully anonymous table has zero suppression") {
    val df = Seq.fill(10)("g").toDF("qi")
    val r = Privacy.kAnonymity(df, Seq("qi"), k = 5L).collect().head
    assert(r.getAs[Long]("n_violating") === 0L)
    assert(r.getAs[Double]("suppression_rate") === 0.0)
  }

  test("randomizedResponse: hash-coin mechanism debiases within tolerance") {
    val df = (1L to 4000L).map(i => Tuple1(i)).toDF("seed")
    val r = Privacy.randomizedResponse(df, "seed", col("seed") % 4 === 0,
      tolerance = 0.05).collect().head
    assert(r.getAs[Long]("n") === 4000L)
    assert(r.getAs[Double]("true_rate") === 0.25)
    // reported ≈ p/2 + 1/4; debiasing must land near the true rate
    assert(math.abs(r.getAs[Double]("debiased") - 0.25) < 0.05)
    assert(r.getAs[Boolean]("est_ok"))
  }
}
