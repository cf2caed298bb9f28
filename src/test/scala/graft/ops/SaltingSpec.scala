package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregation equals the direct aggregation on skewed data") {
    // one hot key (90% of rows) + long tail
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 37}"
      (k, i.toLong, i * 0.5)
    }
    val df = rows.toDF("key", "id", "v")
    val salted = Salting.saltedStats(df, Seq("key"), "v", $"id", saltBuckets = 8)
      .orderBy("key").collect()
    val direct = df.groupBy("key")
      .agg(sum($"v").as("s"), count($"v").as("n"), avg($"v").as("a"))
      .orderBy("key").collect()
    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) === d.getString(0))
      assert(math.abs(s.getDouble(1) - d.getDouble(1)) < 1e-6)
      assert(s.getLong(2) === d.getLong(2))
      assert(math.abs(s.getDouble(3) - d.getDouble(3)) < 1e-9)
    }
  }

  test("salt spreads a hot key over the requested bucket range") {
    val df = (1 to 500).map(i => ("hot", i.toLong)).toDF("key", "id")
    val buckets = df.select(Salting.salt($"id", 8).as("s"))
      .distinct().as[Int].collect().toSet
    assert(buckets.size > 4 && buckets.forall(b => b >= 0 && b < 8))
  }

  test("saltedJoin equals the plain inner join, hot key included") {
    // one hot key (100 rows), two cold, one unmatched each side
    val big = ((1 to 100).map(i => (7L, i.toLong)) ++
      Seq((1L, 200L), (2L, 201L), (99L, 202L))).toDF("k", "rid")
    val small = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (50L, "orphan"))
      .toDF("sk", "label")
    val salted = Salting.saltedJoin(big, small, "k", "sk", $"rid", 4)
      .select("k", "rid", "label").collect().map(_.toSeq).toSet
    val plain = big.join(small, $"k" === $"sk")
      .select("k", "rid", "label").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 102)
  }

  test("saltedJoin preconditions fail fast") {
    val df = Seq((1L, 2L)).toDF("k", "rid")
    val s = Seq((1L, "x")).toDF("sk", "label")
    intercept[IllegalArgumentException](
      Salting.saltedJoin(df, s, "k", "sk", $"rid", 0))
    intercept[IllegalArgumentException](
      Salting.saltedJoin(df.withColumnRenamed("rid", "__salt"), s, "k", "sk", $"k", 2))
  }
}
