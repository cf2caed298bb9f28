package graft.ext

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Some("a"), Some(1)), (Some("a"), None), (Some("b"), Some(3)), (None, Some(3))
  ).toDF("s", "n")

  test("profile: null counts, distincts, stringified min/max per column") {
    val p = Profile.profile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = p("s")
    assert(s.getLong(1) === 4 && s.getLong(2) === 1)       // n_rows, n_null
    assert(s.getDouble(3) === 0.25)                        // null_frac
    assert(s.getLong(4) === 2)                             // n_distinct (non-null)
    assert(s.getString(5) === "a" && s.getString(6) === "b")
    val n = p("n")
    assert(n.getLong(2) === 1 && n.getLong(4) === 2)
    assert(n.getString(5) === "1" && n.getString(6) === "3")
  }

  test("approxProfile matches exact counts on tiny cardinalities") {
    val p = Profile.approxProfile(df, Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(4) === 2)
  }

  test("fkViolations counts orphans, ignoring NULL fks") {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val got = Profile.fkViolations(child, "fk", parent, "pk").collect()(0)
    assert(got.getLong(0) === 4 && got.getLong(1) === 1)
    assert(got.getDouble(2) === 0.25)
  }

  test("keySkew: heavy keys first, exact share and skew factor, stable ties") {
    // key 7 → 6 rows, key 3 → 2, keys 1/2 → 1 each: 10 rows, 4 keys.
    val rows = Seq.fill(6)(7) ++ Seq(3, 3, 1, 2)
    val skew = Profile.keySkew(rows.toDF("k"), "k", 3).collect()
    assert(skew.map(_.getInt(0)).toSeq === Seq(7, 3, 1)) // tie 1-vs-2 → key asc
    val top = skew(0)
    assert(top.getLong(1) === 6)
    assert(top.getDouble(2) === 0.6)       // share 6/10
    assert(top.getDouble(3) === 2.4)       // skew 6 / (10/4)
    assert(top.getLong(4) === 4 && top.getLong(5) === 10)
  }

  test("keySkew: uniform keys have skew factor 1.0") {
    val skew = Profile.keySkew(Seq(1, 1, 2, 2, 3, 3).toDF("k"), "k", 2).collect()
    assert(skew.forall(_.getDouble(3) === 1.0))
  }

  test("keySkew rejects non-positive topN") {
    intercept[IllegalArgumentException](
      Profile.keySkew(Seq(1).toDF("k"), "k", 0))
  }

  test("histogramEquiDepth splits a uniform range into equal-count bins") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = Profile.histogramEquiDepth(df, "v", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.map(_._1).sum === 100L)
    // near-equal depths (boundary interpolation may shift one row)
    assert(got.values.forall(v => v._1 >= 24 && v._1 <= 26), got.toString)
    assert(got(0L)._2 === 1.0 && got(3L)._3 === 100.0)
  }

  test("histogramEquiDepth adapts to skew where equi-width cannot") {
    // 99 values at ~0, one at 1000: equi-width piles 99 rows into one
    // bucket; equi-depth still cuts the mass into populated bins.
    val df = ((1 to 99).map(_ / 100.0) ++ Seq(1000.0)).toDF("v")
    val eqw = Profile.histogram(df, "v", 250.0).collect()
    assert(eqw.length === 2, "equi-width collapses to 2 buckets")
    val eqd = Profile.histogramEquiDepth(df, "v", 4).collect()
    assert(eqd.length === 4, "equi-depth keeps 4 populated bins")
    assert(eqd.map(_.getLong(1)).sum === 100L)
  }
}
