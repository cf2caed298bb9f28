package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("covarianceMatrix matches the closed form on a tiny frame") {
    // vectors (1,0), (0,1), (-1,0), (0,-1): mean 0, var 0.5 per dim, cov 0
    val df = Seq(
      Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(0.0, -1.0)
    ).toDF("embedding")
    val m = Pca.collectMatrix(Pca.covarianceMatrix(df, "embedding"))
    assert(m(0)(0) === 0.5 && m(1)(1) === 0.5 && m(0)(1) === 0.0 && m(1)(0) === 0.0)
  }

  test("topComponents recovers the closed-form eigensystem of [[2,1],[1,2]]") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val Seq((l1, q1), (l2, q2)) = Pca.topComponents(m, 2)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(l1 - 3.0) <= 1e-9 && math.abs(l2 - 1.0) <= 1e-9)
    assert(q1.zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) <= 1e-9 })
    assert(q2.zip(Array(s, -s)).forall { case (a, b) => math.abs(a - b) <= 1e-9 })
  }

  test("components are orthonormal on the real fixture spectrum (near-degenerate)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.collectMatrix(Pca.covarianceMatrix(emb, "embedding", scale = 9))
    val comps = Pca.topComponents(m, 6)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    comps.foreach { case (_, q) => assert(math.abs(dot(q, q) - 1.0) <= 1e-9) }
    for { a <- comps.indices; b <- comps.indices if a < b }
      assert(math.abs(dot(comps(a)._2, comps(b)._2)) <= 1e-9)
    // eigenvalues land descending (within iteration tolerance)
    val ls = comps.map(_._1)
    assert(ls.sliding(2).forall { case Seq(x, y) => x >= y - 1e-6 * ls.head; case _ => true })
  }

  test("project emits the dot products against the given components") {
    val df = Seq(Seq(3.0, 4.0)).toDF("embedding")
    val comps = Seq(Array(1.0, 0.0), Array(0.6, 0.8))
    val row = Pca.project(df, "embedding", comps)
      .select(col("projected")).head().getSeq[Double](0)
    assert(row === Seq(3.0, 5.0))
  }
}
