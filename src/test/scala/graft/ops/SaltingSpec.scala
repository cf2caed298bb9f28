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
}
