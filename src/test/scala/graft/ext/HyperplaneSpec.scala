package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HyperplaneSpec extends SparkTestBase {
  import spark.implicits._

  test("hyperplane bucket: deterministic, near-identical vectors collide, opposite differ") {
    val base = Array.tabulate(16)(i => math.sin(i * 1.7).toFloat)
    val near = base.clone(); near(3) = near(3) + 1e-4f
    val opposite = base.map(x => -x)
    val df = Seq((1L, base), (2L, near), (3L, opposite)).toDF("id", "vec")
      .select($"id", Similarity.asDouble($"vec").as("v"))
      .select($"id", Similarity.hyperplaneBucket($"v", bits = 8, dims = 16).as("b"))
    val got = df.orderBy("id").as[(Long, Int)].collect()
    assert(got(0)._2 === got(1)._2)          // tiny perturbation -> same bucket
    assert(got(0)._2 === (~got(2)._2 & 0xFF)) // negation flips every plane bit
    // determinism across evaluations
    val again = Seq((1L, base)).toDF("id", "vec")
      .select(Similarity.hyperplaneBucket(
        Similarity.asDouble($"vec"), bits = 8, dims = 16)).as[Int].head()
    assert(again === got(0)._2)
  }

  test("oracle-side plane signs equal Spark's folded xxhash64 constants") {
    // graft.ExtQueries.planeSign re-derives, outside any Spark plan, the
    // ±1 the hyperplaneBucket expression folds out of xxhash64(bit, dim);
    // the DuckDB oracle for q_ext_ann_hyperplane embeds those constants.
    val bits = 8; val dims = 64
    val sparkSigns = spark.range(1)
      .select((for (i <- 0 until bits; d <- 0 until dims) yield
        when(getbit(xxhash64(lit(i), lit(d)), lit(0)) === 1, 1).otherwise(-1)): _*)
      .head().toSeq.map(_.asInstanceOf[Int])
    val oracleSigns = for (i <- 0 until bits; d <- 0 until dims)
      yield graft.ExtQueries.planeSign(i, d)
    assert(sparkSigns === oracleSigns)
    // sanity: the family is balanced enough to be useful
    assert(math.abs(oracleSigns.sum) < bits * dims / 4)
  }

  test("jaccard doc-frequency pruning drops only ultra-common tokens") {
    // 'common' appears in all 4 docs; pair similarity must still be found
    val docs = Seq(
      (1L, "common alpha beta gamma"),
      (2L, "common alpha beta gamma"),
      (3L, "common zeta eta theta"),
      (4L, "common iota kappa lambda")).toDF("doc_id", "text")
    val pruned = Dedup.wordJaccardPairs(docs, "doc_id", "text", 0.5, maxDocFreq = 0.5)
    val keys = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys === Set((1L, 2L))) // exact dup still found via non-common tokens
  }
}
