package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IvfTrainedSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val queries = emb.filter(col("id") % 25 === 0)
  private lazy val sampled = emb.filter(col("id") % 50 === 7)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("one Lloyd step keeps the cell count and vector arity") {
    val t = Similarity.lloydStep(emb, sampled)
    val rows = t.select(col("id"), size(col("vec")).as("d")).collect()
    assert(rows.length === sampled.count().toInt)
    val dim = emb.select(size(col("vec"))).head().getInt(0)
    assert(rows.forall(_.getInt(1) === dim))
  }

  test("lloydStep is deterministic across partitionings") {
    val a = Similarity.lloydStep(emb, sampled).orderBy("id").collect().toSeq
    val b = Similarity.lloydStep(emb.repartition(13), sampled)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("trained IVF recall vs brute force >= the sampled variant (the training payoff)") {
    val brute = pairs(Similarity.bruteForceTopK(queries, emb, k = 3))
    val ivfSampled = pairs(Similarity.ivfTopK(queries, emb, sampled, k = 3, nProbe = 4))
    val trained = Similarity.lloydStep(emb, sampled)
    val ivfTrained = pairs(Similarity.ivfTopK(queries, emb, trained, k = 3, nProbe = 4))
    val rSampled = (brute intersect ivfSampled).size.toDouble / brute.size
    val rTrained = (brute intersect ivfTrained).size.toDouble / brute.size
    info(f"recall sampled=$rSampled%.3f trained=$rTrained%.3f")
    assert(rTrained >= rSampled,
      f"training regressed recall: $rTrained%.3f < $rSampled%.3f")
    // three iterations must STRICTLY beat the sampled quantizer on this
    // fixture (measured 0.617 -> 0.717; deterministic, so not flaky)
    val trained3 = Similarity.lloyd(emb, sampled, iters = 3)
    val ivf3 = pairs(Similarity.ivfTopK(queries, emb, trained3, k = 3, nProbe = 4))
    val r3 = (brute intersect ivf3).size.toDouble / brute.size
    info(f"recall trained3=$r3%.3f")
    assert(r3 > rSampled,
      f"k-means-3 failed to improve recall: $r3%.3f <= $rSampled%.3f")
  }
}
