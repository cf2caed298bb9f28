package graft

/** Drift guard for [[ExtQueries.prepare]] (the bench's untimed
  * store-build hooks): every prep key must name a real driver query —
  * a renamed gate with a stale prep entry would silently stop
  * prepping, and the scaled bench would quietly go back to timing
  * store build + probe together (the round-8 regression this map
  * exists to prevent).
  */
class PrepareSpec extends SparkTestBase {

  test("every prepare key names a declared driver query") {
    val qs = SparkEntry.queries.keySet
    val orphans = ExtQueries.prepare.keySet.diff(qs)
    assert(orphans.isEmpty,
      s"prepare entries without a matching query: ${orphans.mkString(", ")}")
  }

  test("a throwing prep hook is RECORDED, not swallowed (r10 bench hardening)") {
    Bench.prepFailed.clear()
    Bench.runPrep("q_fake_forced_failure",
      Some((_, _) => throw new RuntimeException("forced")), spark, "/nonexistent")
    assert(Bench.prepFailed.contains("q_fake_forced_failure"),
      "prep failure must land in Bench.prepFailed for the artifact's prep_failed field")
    Bench.prepFailed.clear()
    // and a green prep records nothing
    Bench.runPrep("q_fake_ok", Some((_, _) => ()), spark, "/nonexistent")
    assert(Bench.prepFailed.isEmpty)
  }

  test("prep then probe: the prepped store satisfies the gate's ensure (no rebuild)") {
    val dir = "/root/testdata/sf0.001"
    val name = "q_ext_dedup_incremental_near"
    ExtQueries.prepare(name)(spark, dir)
    // after prep, the gate's own ensure must see both store halves
    val store = ExtQueries.scratchTable(spark, "g_mh_store", dir)
    assert(spark.catalog.tableExists(s"${store}_bands"))
    assert(spark.catalog.tableExists(s"${store}_sigs"))
    // and the query itself runs green against the prepped store
    assert(SparkEntry.queries(name)(spark, dir).count() >= 0L)
  }
}
