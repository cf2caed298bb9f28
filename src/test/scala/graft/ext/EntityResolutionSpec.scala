package graft.ext

import graft.SparkTestBase

class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  test("suffix typos cluster; a block-changing prefix is a (deliberate) miss") {
    val recs = Seq(
      (1L, "Germany"), (2L, "Germanys"),   // same block "ger", dist 1
      (3L, "The Germany"),                 // block "the" -> invisible
      (4L, "France"), (5L, "FRANCE!!")     // normalization erases case/punct
    ).toDF("id", "name")
    val out = EntityResolution.resolve(recs, "id", "name")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((2L, 3L)))  // {1, 2}
    assert(out(4L) === ((2L, 9L)))  // {4, 5}
    assert(!out.contains(3L), "prefix variant must be a blocking miss")
  }

  test("transitive chains collapse to one entity") {
    // abcdef ~ abcdeX ~ abcdXY: 1-2 dist 1, 2-3 dist 2, 1-3 dist 2 -> one entity
    val recs = Seq((10L, "abcdef"), (11L, "abcdeX"), (12L, "abcdXY"))
      .toDF("id", "name")
    val out = EntityResolution.resolve(recs, "id", "name").collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 10L && out.head.getLong(1) === 3L)
  }

  test("distinct names in one block stay separate beyond the distance cap") {
    val recs = Seq((1L, "market"), (2L, "martian")).toDF("id", "name")
    assert(EntityResolution.resolve(recs, "id", "name").collect().isEmpty)
  }
}
