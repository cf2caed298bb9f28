package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Product quantization: determinism (the gate's real contract — the
  * whole stack replays in SQL), reconstruction sanity (every query's
  * own vector survives into its ADC top-10 even at this codebook size),
  * and honest recall accounting on an isotropic corpus.
  *
  * Note on the recall number: these synthetic embeddings are isotropic
  * noise — the WORST case for any quantizer (no cluster structure to
  * exploit; 4×~10-centroid codebooks retain little ranking signal), so
  * the pinned floor is modest by design. The gate's value is the
  * engine mechanics (bounded Lloyd per subspace, broadcast LUT,
  * decimal-exact ADC), not a benchmark recall.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def run(df: org.apache.spark.sql.DataFrame) = {
    val cb = Pq.trainCodebooks(df, "id", "vec", 4, 16,
      centFilter = col("id") % 50 === 7, iters = 1)
    val codes = Pq.encode(df, "id", "vec", cb, 4, 16)
    Pq.adcTopK(df.filter(col("id") % 25 === 0), codes, cb, 10, 4, 16)
  }

  test("ADC result identical under repartitioning (decimal sums, rounded argmaxes)") {
    val a = run(emb).collect().map(_.toSeq).toSet
    val b = run(emb.repartition(7, col("id"))).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("every query's own vector is in its ADC top-10") {
    val r = run(emb)
    val nQ = r.select(col("query_id")).distinct().count()
    val selfHits = r.filter(col("query_id") === col("neighbor_id")).count()
    assert(nQ > 0 && selfHits === nQ)
  }

  test("codes are dense: every vector gets exactly one code per subspace") {
    val cb = Pq.trainCodebooks(emb, "id", "vec", 4, 16,
      centFilter = col("id") % 50 === 7, iters = 1)
    val codes = Pq.encode(emb, "id", "vec", cb, 4, 16)
    val n = emb.count()
    assert(codes.count() === n * 4)
    assert(codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).count() === 0)
    // codebook ids only
    val cents = cb.select(col("sub"), col("cent_id").as("code"))
    assert(codes.join(cents, Seq("sub", "code"), "left_anti").count() === 0)
  }
}
