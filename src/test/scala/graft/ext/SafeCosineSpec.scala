package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-7 ADVICE closure: a zero-norm vector yields cosine 0/0 = NaN,
  * and NaN ORDERS differently per argmin spelling (first under a DESC
  * window, last under min(struct), ignored by a strict-> fold) — so a
  * degenerate embedding could silently pick a different cell per
  * spelling. All spellings now coalesce NaN to -1.0 — the value DuckDB's
  * `list_cosine_similarity` RETURNS for zero-norm operands — so every
  * engine path and every oracle replay agree: the degenerate row ties
  * all centroids at -1.0 and the ascending-id tie-break resolves
  * identically everywhere.
  */
class SafeCosineSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f)), // zero-norm: every cosine is NaN -> -1.0
    (3L, Array(0.0f, 1.0f))
  ).toDF("vec_id", "embedding")
  private val cents = Seq(
    (10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f))).toDF("id", "vec")

  test("semDeDup min(struct) argmin: degenerate vector lands in the LOWEST cell id") {
    val got = Similarity.semDeDup(emb, "vec_id", "embedding", cents, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 10L, s"zero-norm row must tie-break to cell 10: $got")
    assert(got(1L) === 10L && got(3L) === 20L)
  }

  test("ivfTopK window argmin assigns the degenerate vector to the same cell") {
    // nProbe = 2 so both cells are probed; the zero-norm CORPUS row
    // must sit in cell 10 (lowest id on the all--1.0 tie), identical
    // to the min(struct) spelling above.
    val queries = Seq((100L, Array(1.0f, 0.1f))).toDF("id", "vec")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val top = Similarity.ivfTopK(queries, corpus, cents, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    // the degenerate neighbor is reachable (cell 10 is probed) and its
    // reported sim is the sentinel -1.0, never NaN
    val deg = top.find(_._1 == 2L)
    assert(deg.nonEmpty, s"zero-norm corpus row unreachable: ${top.toSeq}")
    assert(deg.get._2 === -1.0)
  }

  test("nearestCellExpr fold agrees with both aggregate spellings") {
    val lit = Seq((10L, Seq(1.0, 0.0)), (20L, Seq(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
      Similarity.nearestCellExpr(
        col("embedding").cast("array<double>"), lit).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 10L, 3L -> 20L))
  }
}
