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

  test("eraseKeys + erasureAudit: tombstoned rows vanish, survivors intact, v1 travels") {
    val dir = java.nio.file.Files.createTempDirectory("erasure").toString
    val base = (1L to 100L).map(i => (i, s"row$i")).toDF("k", "payload")
    graft.io.SnapshotTable.writeSnapshot(base, dir, 1, "k", 2)
    val tomb = Seq(3L, 30L, 77L).toDF("k")
    Privacy.eraseKeys(spark, dir, 1, 2, "k", tomb, 2)
    val audit = Privacy.erasureAudit(spark, dir, 1, 2, "k", tomb)
      .collect().head
    assert(audit.getAs[Long]("n_before") === 100L)
    assert(audit.getAs[Long]("n_after") === 97L)
    assert(audit.getAs[Long]("n_tombstoned") === 3L)
    assert(audit.getAs[Long]("deleted_remaining") === 0L)
    assert(audit.getAs[Long]("survivors_intact") === 1L)
    // copy-on-write: time travel to the pre-erasure version still works
    assert(graft.io.SnapshotTable.readSnapshot(spark, dir, 1).count() === 100L)
  }

  test("erasureAudit catches an erasure that deleted the wrong rows") {
    val dir = java.nio.file.Files.createTempDirectory("erasure2").toString
    val base = (1L to 50L).map(i => (i, i * 10)).toDF("k", "v")
    graft.io.SnapshotTable.writeSnapshot(base, dir, 1, "k", 2)
    // "buggy" erasure: drops key 7 instead of the tombstoned key 9
    graft.io.SnapshotTable.writeSnapshot(
      base.filter(col("k") =!= 7L), dir, 2, "k", 2)
    val audit = Privacy.erasureAudit(spark, dir, 1, 2, "k",
      Seq(9L).toDF("k")).collect().head
    assert(audit.getAs[Long]("deleted_remaining") === 1L)
    assert(audit.getAs[Long]("survivors_intact") === 0L)
  }

  test("pseudonymize: deterministic salted surrogate, raw id gone") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("uid", "v")
    val p = Privacy.pseudonymize(df, "uid", salt = "s")
    assert(!p.columns.contains("uid"))
    val ids = p.select("pseudo_id").collect().map(_.getString(0))
    assert(ids(0).length === 16)
    // same id -> same surrogate; different id -> different surrogate
    assert(ids(0) === ids(1))
    assert(ids(0) !== ids(2))
    // keyed: a different salt yields a different mapping
    val other = Privacy.pseudonymize(df, "uid", salt = "t")
      .select("pseudo_id").collect().map(_.getString(0))
    assert(other(0) !== ids(0))
  }

  test("pseudonymizeAudit: injectivity + group structure, BIGINT row") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).map(Tuple1(_)).toDF("uid")
    val r = Privacy.pseudonymizeAudit(df, "uid", salt = "s").collect().head
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("n_ids") === 3L)
    assert(r.getAs[Long]("n_surrogates") === 3L)
    assert(r.getAs[Long]("structure_intact") === 1L)
  }

  test("randomizedResponse: hash-coin mechanism debiases within tolerance") {
    val df = (1L to 4000L).map(i => Tuple1(i)).toDF("seed")
    val r = Privacy.randomizedResponse(df, "seed", col("seed") % 4 === 0,
      tolerance = 0.05).collect().head
    assert(r.getAs[Long]("n") === 4000L)
    assert(r.getAs[Double]("true_rate") === 0.25)
    // reported ≈ p/2 + 1/4; debiasing must land near the true rate
    assert(math.abs(r.getAs[Double]("debiased") - 0.25) < 0.05)
    assert(r.getAs[Long]("est_ok") === 1L)
  }

  test("dpNoisyCounts: Laplace mechanism is deterministic, bounded, and non-degenerate") {
    val df = (Seq.fill(40)("en") ++ Seq.fill(25)("de") ++ Seq.fill(9)("zh"))
      .toDF("lang")
    val rows = Privacy.dpNoisyCounts(df, "lang", eps = 0.5)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("true_n"), r.getAs[Double]("noisy_n"),
          r.getAs[Int]("noise_bound_ok"))).toMap
    assert(rows.keySet === Set("en", "de", "zh"))
    assert(rows("en")._1 === 40L && rows("de")._1 === 25L && rows("zh")._1 === 9L)
    // the mechanism must actually perturb (noise is a.s. nonzero) and
    // stay inside the mechanism's worst-case bound at this eps
    assert(rows.values.forall(_._3 === 1))
    assert(rows.values.exists(v => v._2 !== v._1.toDouble))
    rows.values.foreach { case (n, noisy, _) =>
      assert(math.abs(noisy - n) <= math.log(1000003.0) / 0.5 + 1e-6)
    }
    // determinism: a second evaluation produces identical draws
    val again = Privacy.dpNoisyCounts(df, "lang", eps = 0.5)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("noisy_n"))
      .toMap
    rows.foreach { case (k, (_, noisy, _)) => assert(again(k) === noisy) }
  }

  test("dpRelease over multi-batch streamed counts equals the batch mechanism") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-dp").toString
    // two micro-batches: the count STATE accumulates across them and the
    // release happens once on the final state
    Seq("en", "en", "de").toDF("lang").write.parquet(s"$dir/b1")
    Seq("en", "de", "zh").toDF("lang").write.parquet(s"$dir/b2")
    val schema = StructType(Seq(StructField("lang", StringType)))
    val counts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .groupBy(col("lang")).agg(count(lit(1)).as("true_n"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("dp_state").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Privacy.dpRelease(spark.table("dp_state"),
        "lang", "true_n", eps = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("true_n"), r.getAs[Double]("noisy_n"))).toMap
    val batch = Privacy.dpNoisyCounts(
        spark.read.parquet(s"$dir/*").select(col("lang")), "lang", eps = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("true_n"), r.getAs[Double]("noisy_n"))).toMap
    assert(streamed === batch)
    assert(streamed("en")._1 === 3L && streamed("zh")._1 === 1L)
  }

  test("dpNoisyCounts: smaller epsilon means larger noise for the same key") {
    val df = Seq.fill(100)("en").toDF("lang")
    def noiseAt(eps: Double): Double = {
      val r = Privacy.dpNoisyCounts(df, "lang", eps).collect().head
      math.abs(r.getAs[Double]("noisy_n") - r.getAs[Long]("true_n"))
    }
    // same uniform draw, scale 1/eps: noise at eps/2 is exactly 2x
    val loose = noiseAt(0.25)
    val tight = noiseAt(1.0)
    assert(loose > tight)
    // 6-dp rounding on each side leaves up to ~2.5e-6 of slack
    assert(math.abs(loose - 4.0 * tight) <= 1e-5)
  }
}
