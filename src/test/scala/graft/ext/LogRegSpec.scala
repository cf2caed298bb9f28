package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Engine-exact GD: the weights must be BIT-IDENTICAL under any
  * partitioning (the fixed-point selling point — a plain double-sum
  * gradient would drift with partition count), the probe must learn
  * real directional signal, and the rational sigmoid must hold its
  * contract.
  */
class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("weights are bit-identical under repartitioning") {
    val emb = Tables.embeddings(spark, sfDir)
    val w1 = LogReg.trainWeights(emb, "vec_id", "embedding", "label", 0, 3, 32.0)
    val w2 = LogReg.trainWeights(emb.repartition(7, col("vec_id")),
      "vec_id", "embedding", "label", 0, 3, 32.0)
    val w3 = LogReg.trainWeights(emb.repartition(1),
      "vec_id", "embedding", "label", 0, 3, 32.0)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.toSeq === w3.toSeq)
    assert(w1.exists(_ != 0.0), "training moved the weights")
  }

  test("probe precision beats the base rate (directional signal is real)") {
    val emb = Tables.embeddings(spark, sfDir)
    val w = LogReg.trainWeights(emb, "vec_id", "embedding", "label", 0, 3, 32.0)
    val r = LogReg.evalConfusion(emb, "vec_id", "embedding", "label", 0, w).head()
    val (tp, fp) = (r.getLong(0), r.getLong(1))
    val n = emb.count().toDouble
    val baseRate = emb.filter(col("label") === 0).count() / n
    assert(tp + fp > 0, "probe predicts some positives at threshold 0.5")
    val precision = tp.toDouble / (tp + fp)
    assert(precision > baseRate,
      s"precision $precision should beat base rate $baseRate")
  }

  test("rational sigmoid: bounds, monotonicity, exact midpoint") {
    val zs = Seq(-100.0, -1.0, -1e-9, 0.0, 1e-9, 1.0, 100.0).toDF("z")
      .select(LogReg.fastSigmoid(col("z")).as("s")).as[Double].collect()
    assert(zs.forall(s => s > 0.0 && s < 1.0))
    assert(zs.sliding(2).forall(p => p(0) < p(1)))
    assert(zs(3) === 0.5)
  }
}
