package graft.ext

import graft.SparkTestBase

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("unsaturated sketch IS the distinct hash set; estimate is exact") {
    val agg = Kmv.KmvAgg(64)
    val hashes = Seq(5L, -3L, 5L, 42L, -3L, 7L)
    val sk = hashes.foldLeft(agg.zero)(agg.reduce)
    assert(sk.length === 4) // distinct only
    assert(sk.sorted.toSeq === sk.toSeq) // sorted invariant
    assert(Kmv.estimate(sk, 64) === 4.0)
  }

  test("saturated sketch keeps only the k smallest; insertion short-circuits") {
    val agg = Kmv.KmvAgg(16)
    val sk = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(sk.length === 16)
    // shifted order: positive longs sort after Long.MinValue^x of small ints;
    // 1..100 shift to MinValue+1..MinValue+100 -> the 16 smallest are 1..16
    assert(sk.map(_ ^ Long.MinValue).toSeq === (1L to 16L))
  }

  test("merge identity: bottom-k of merge equals bottom-k of concatenation") {
    val agg = Kmv.KmvAgg(16)
    val a = (1L to 50L by 2).foldLeft(agg.zero)(agg.reduce)  // odds
    val b = (2L to 50L by 2).foldLeft(agg.zero)(agg.reduce)  // evens
    val direct = (1L to 50L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b).toSeq === direct.toSeq)
    assert(Kmv.mergeSketches(a, b, 16).toSeq === direct.toSeq)
  }

  test("setAlgebraContract: exact counts hash-grade, identities and estimates hold") {
    // A = x0..x299 (even ids), B = x200..x499 (odd ids):
    // |A|=300 |B|=300 |A∩B|=100 |A∪B|=500.
    val rows =
      (0 until 300).map(i => (s"x$i", 0L)) ++
        (200 until 500).map(i => (s"x$i", 1L))
    val df = rows.toDF("v", "side")
    val r = Kmv.setAlgebraContract(df, "v", "side", k = 256, relTol = 0.2)
      .collect().head
    assert(r.getLong(0) === 300 && r.getLong(1) === 300)
    assert(r.getLong(2) === 100 && r.getLong(3) === 500)
    assert(r.getLong(4) === 1L, "bottom-k merge identity must be exact")
    assert(r.getLong(5) === 1L, "union estimate out of tolerance")
    assert(r.getLong(6) === 1L, "intersection estimate out of tolerance")
  }

  test("one empty side: estimates degrade gracefully, no crash") {
    val df = (0 until 50).map(i => (s"x$i", 0L)).toDF("v", "side")
    val r = Kmv.setAlgebraContract(df, "v", "side", k = 64).collect().head
    assert(r.getLong(0) === 50 && r.getLong(1) === 0)
    assert(r.getLong(2) === 0 && r.getLong(3) === 50)
    assert(r.getLong(4) === 1L && r.getLong(5) === 1L && r.getLong(6) === 1L)
  }
}
