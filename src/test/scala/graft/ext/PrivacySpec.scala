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
    assert(audit.getAs[Boolean]("survivors_intact"))
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
    assert(!audit.getAs[Boolean]("survivors_intact"))
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
    assert(r.getAs[Boolean]("est_ok"))
  }
}
