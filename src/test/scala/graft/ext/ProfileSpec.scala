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
}
