package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  test("scores are deterministic, bounded, and repartition-invariant") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "solar radiation data aggregates into buckets"),
      (3L, "the the the the the")
    ).toDF("doc_id", "text")
    val a = QualityModel.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = QualityModel.hashedLinearScore(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0))
    assert(a.forall(r => (r.getLong(2) == 1L) === (r.getDouble(1) >= 0.5)))
    // a single repeated token scores exactly sigmoid(w(bucket))
    val w = QualityModel.bucketWeight(
      QualityModel.featureBucket(lit("the"), 256, "qm"))
    val expected = spark.range(1)
      .select(round(lit(1.0) / (lit(1.0) + exp(-w)), 6)).head().getDouble(0)
    assert(a(2).getDouble(1) === expected)
  }

  test("one shuffle: token rows partial-aggregate, the weight table broadcasts") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val plan = QualityModel.hashedLinearScore(docs, "doc_id", "text")
      .queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 1, s"expected <= 1 shuffle:\n$plan")
  }
}
