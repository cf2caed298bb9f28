package graft.ext

import graft.SparkTestBase

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("aa"), Some("en"), Some(10.0)),
    (Some(2L), Some("bb"), Some("de"), Some(20.0)),
    (Some(2L), None,       Some("xx"), Some(999.0)),
    (Some(4L), Some("cc"), None,       None)
  ).toDF("id", "text", "lang", "score")

  private def report(checks: Seq[Expectations.Check]) =
    Expectations.suite(df, checks).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4) == 1L)).toMap

  test("one pass evaluates every constraint with integer-ratio metrics") {
    val rep = report(Seq(
      Expectations.NotNull("text", 1.0),
      Expectations.Unique("id"),
      Expectations.InSet("lang", Seq("en", "de"), 0.5),
      Expectations.Between("score", 0.0, 100.0, 0.9),
      Expectations.Matches("text", "^[a-z]+$", 1.0)))
    // text: 3 of 4 non-null
    assert(rep(("not_null", "text")) === ((0.75, 1.0, false)))
    // id: 3 distinct over 4 non-null
    assert(rep(("unique", "id")) === ((0.75, 1.0, false)))
    // lang: 2 of 3 non-null in {en, de}; observed is 6-dp rounded
    assert(rep(("in_set", "lang"))._1 === 0.666667)
    assert(rep(("in_set", "lang"))._3 === true)
    // score: 2 of 3 non-null inside [0, 100] -> below 0.9
    assert(rep(("between", "score"))._3 === false)
    // matches: all 3 non-null texts are lowercase
    assert(rep(("matches", "text")) === ((1.0, 1.0, true)))
  }

  test("passing suite on a clean column set") {
    val rep = report(Seq(
      Expectations.NotNull("id", 1.0),
      Expectations.InSet("lang", Seq("en", "de", "xx"), 1.0)))
    assert(rep(("not_null", "id"))._3 === true)
    assert(rep(("in_set", "lang"))._3 === true)
  }

  test("empty input observes 0.0 and fails instead of nulling out") {
    val rep = Expectations.suite(
        df.filter($"id" < 0L), Seq(Expectations.NotNull("text", 0.5)))
      .collect().head
    assert(rep.getDouble(2) === 0.0 && rep.getLong(4) === 0L)
  }

  test("refIntegrity: orphan rows and keys counted separately") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"), (9L, "e"),
      (8L, "f")).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.refIntegrity(child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[Long]("n_child") === 6L)
    assert(r.getAs[Long]("n_fk_keys") === 4L)
    assert(r.getAs[Long]("n_orphan_rows") === 3L) // 9,9,8
    assert(r.getAs[Long]("n_orphan_keys") === 2L) // {9, 8}
    assert(r.getAs[Double]("orphan_rate") === 0.5)
  }

  test("refIntegrity: fully consistent tables report zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.refIntegrity(child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[Long]("n_orphan_rows") === 0L)
    assert(r.getAs[Double]("orphan_rate") === 0.0)
  }
}
