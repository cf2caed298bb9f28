package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical -> 1
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f))   // opposite -> -1
    ).toDF("a", "b")
    val got = df.select(
      Similarity.cosine(Similarity.asDouble($"a"), Similarity.asDouble($"b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, -0.1f, 0.0f)), // same sign bucket as id 1, cosine ~0.994
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("id", "vec")

  test("embedOutliers flags sparse cells and far-from-centroid vectors, nothing else") {
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)),    // dense cell around c0
      (11L, Array(0.99f, 0.02f)),
      (12L, Array(0.98f, -0.02f)),
      (13L, Array(1.0f, 0.01f)),
      (20L, Array(0.0f, 1.0f)),    // alone in c1's cell -> sparse
      (30L, Array(0.6f, -0.8f))    // best cell c0 but cosine 0.6 < 0.7 -> far
    ).toDF("id", "vec")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("id", "vec")
    val got = Similarity.embedOutliers(vecs, "id", "vec", cents,
        minCell = 3L, simFloor = 0.7)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cell"), r.getAs[Long]("cell_n"),
          r.getAs[Int]("sparse_cell"), r.getAs[Int]("far_from_centroid")))
      .toMap
    // only the isolated vector and the far vector surface
    assert(got.keySet === Set(20L, 30L))
    assert(got(20L) === ((1L, 1L, 1, 0)))   // sparse but well-aligned
    assert(got(30L) === ((0L, 5L, 0, 1)))   // dense cell but far
  }

  test("hardNegatives excludes the query's own label and ranks the rest") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f), 0L),
      (2L, Array(0.95f, 0.05f), 0L),  // same label: similar but EXCLUDED
      (3L, Array(0.8f, 0.2f), 1L),    // different label, most similar
      (4L, Array(0.0f, 1.0f), 1L)     // different label, orthogonal
    ).toDF("id", "vec", "label")
    val got = Similarity.hardNegatives(labeled.filter($"id" === 1), labeled, k = 2)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(3L, 4L), "rank 1 must be the similar-but-wrong-label vector")
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val got = Similarity.bruteForceTopK(corpus.filter($"id" === 1), corpus, k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(2L, 3L)) // closest first
    assert(got(0).getInt(2) === 1)
  }

  test("bucketedTopK only pairs within the same sign bucket") {
    val got = Similarity.bucketedTopK(corpus.filter($"id" === 1), corpus, k = 5, bits = 3)
      .collect().map(_.getLong(1)).toSet
    // id 4 has a different sign pattern in dim 1 -> different bucket
    assert(got.contains(2L))
    assert(!got.contains(4L))
  }

  test("ivfTopK: probed cells cover the true neighbor, unprobed cells are invisible") {
    // Two well-separated clusters around +x and +y; centroids = one seed
    // per cluster. With nProbe=1 each query only sees its own cell.
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f)),
      (2L, Array(0.95f, 0.0f, 0.05f)),
      (3L, Array(0.9f, -0.05f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.05f)),
      (11L, Array(0.05f, 0.95f, 0.0f)),
      (12L, Array(0.0f, 0.9f, -0.05f))
    ).toDF("id", "vec")
    val cents = vecs.filter($"id".isin(1L, 10L))
    val got = Similarity.ivfTopK(
        vecs.filter($"id" === 2L), vecs, cents, k = 5, nProbe = 1)
      .collect()
    val neighbors = got.map(_.getLong(1)).toSet
    // own-cluster members found, cross-cluster members never scanned
    assert(neighbors === Set(1L, 3L))
    // nProbe=2 opens the second cell: all five other vectors now visible
    val wide = Similarity.ivfTopK(
        vecs.filter($"id" === 2L), vecs, cents, k = 10, nProbe = 2)
      .collect().map(_.getLong(1)).toSet
    assert(wide === Set(1L, 3L, 10L, 11L, 12L))
    // ranks are exact-cosine order within the probed set
    assert(got.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq === Seq(1L, 3L))
  }

  test("int8 quantization: per-component error <= step/2, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val q = df.select($"id",
      Similarity.quantizeInt8($"vec").as("q"),
      Similarity.asDouble($"vec").as("v"))
    val rows = q.select($"id", $"q.step", $"q.codes",
        Similarity.dequantizeInt8($"q").as("deq"), $"v")
      .orderBy("id").collect()

    val step = rows(0).getDouble(1)
    assert(step === 1.0 / 127.0)
    val deq = rows(0).getSeq[Double](3)
    val orig = rows(0).getSeq[Double](4)
    deq.zip(orig).foreach { case (d, o) =>
      assert(math.abs(d - o) <= step / 2 + 1e-12, s"$d vs $o")
    }
    // max-magnitude component is exact (code +-127)
    assert(rows(0).getSeq[Byte](2)(1) === -127)
    // zero vector: step 0, all-zero codes, reconstructs to zeros
    assert(rows(1).getDouble(1) === 0.0)
    assert(rows(1).getSeq[Double](3).forall(_ === 0.0))
  }

  test("cosineNearDupPairs finds the one close pair") {
    val got = Similarity.cosineNearDupPairs(corpus, "id", "vec", minCosine = 0.95, bits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("groupCentroids averages per (key, dim); centroidSimilarity is cosine of prototypes") {
    val df = Seq(
      ("a", Seq(1.0, 0.0)), ("a", Seq(3.0, 0.0)),   // centroid (2, 0)
      ("b", Seq(0.0, 2.0)),                          // centroid (0, 2)
      ("c", Seq(4.0, 0.0))                           // centroid (4, 0)
    ).toDF("k", "vec")
    val cent = Similarity.groupCentroids(df, "k", "vec")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cent(("a", 0L)) === 2.0 && cent(("a", 1L)) === 0.0)
    assert(cent(("b", 1L)) === 2.0)
    val sims = Similarity.centroidSimilarity(df, "k", "vec")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(sims(("a", "b")) === 0.0) // orthogonal prototypes
    assert(sims(("a", "c")) === 1.0) // parallel prototypes
    assert(sims(("b", "c")) === 0.0)
  }

  test("semDeDup drops the higher id of a within-cluster near-dup pair only") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),    // cell x
      (2L, Array(0.99f, 0.01f)),  // cell x, near-dup of 1 -> dropped
      (3L, Array(0.0f, 1.0f)),    // cell y, alone
      (4L, Array(-1.0f, 0.0f))    // cell z (anti-parallel to x centroid)
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)),
      (12L, Array(-1.0f, 0.0f))).toDF("id", "vec")
    val got = Similarity.semDeDup(emb, "vec_id", "embedding", cents, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("semDeDup never pairs across cells even when vectors are close") {
    // 1 and 2 are near-identical but straddle the two centroids' decision
    // boundary -> different cells -> both kept.
    val emb = Seq(
      (1L, Array(1.0f, 0.9f)),
      (2L, Array(0.9f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val got = Similarity.semDeDup(emb, "vec_id", "embedding", cents, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("semDeDup capPerCell keeps overflow members without scanning them") {
    // Three copies of the same direction in one cell; cap=2 means member
    // rank 3 (id 3) is never scanned as a pair side -> kept, while id 2
    // is still dropped against id 1.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.001f)),
      (3L, Array(1.0f, 0.002f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val got = Similarity.semDeDup(
      emb, "vec_id", "embedding", cents, tau = 0.99, capPerCell = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // kept, scanned: id 3 is kept ONLY because the cap exempted it, and
    // the honest marker says so (scanned=false); scanned rows say true.
    assert(got === Map(
      1L -> ((1L, 1L)), 2L -> ((0L, 1L)), 3L -> ((1L, 0L))))
  }

  test("nearestCellExpr matches the batch argmin, including the id tie-break") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f))    // equidistant from both centroids -> lower id
    ).toDF("vec_id", "embedding")
    val cents = Seq((10L, Seq(1.0, 0.0)), (20L, Seq(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
        Similarity.nearestCellExpr(col("embedding").cast("array<double>"), cents)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 10L, 2L -> 20L, 3L -> 10L))
  }

  test("mipsTopK ranks by inner product, not cosine") {
    // corpus: a long vector aligned-ish with q beats a short perfectly
    // aligned one under MIPS (cosine would invert the order).
    val corpus = Seq(
      (1L, Array(10.0f, 1.0f)),   // dot with q = 10, cosine ~0.995
      (2L, Array(1.0f, 0.0f)),    // dot 1, cosine 1.0
      (3L, Array(0.0f, 5.0f)))    // dot 0
      .toDF("id", "vec")
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val got = Similarity.mipsTopK(q, corpus, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("norm-augmentation reduction: cosine order on augmented = MIPS order") {
    val corpus = (1L to 40L).map(i =>
      (i, Array((i % 7).toFloat - 3f, (i % 5).toFloat, (i % 3).toFloat)))
      .toDF("id", "vec")
    val queries = Seq((101L, Array(1.0f, 2.0f, -1.0f)),
      (102L, Array(-2.0f, 0.5f, 1.0f))).toDF("id", "vec")
    val mips = Similarity.mipsTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cosOnAug = Similarity.bruteForceTopK(
        Similarity.mipsAugmentQueries(queries),
        Similarity.mipsAugmentCorpus(corpus), k = 5, simScale = 7)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cosOnAug === mips,
      "augmented-cosine ranking must reproduce the MIPS ranking")
  }
}
