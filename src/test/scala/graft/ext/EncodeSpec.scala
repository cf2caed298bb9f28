package graft.ext

import graft.SparkTestBase

class EncodeSpec extends SparkTestBase {
  import spark.implicits._

  test("targetEncodeLoo: excludes the row's own label") {
    val df = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 4.0),
      (4L, "B", 10.0)).toDF("id", "cat", "y")
    val out = Encode.targetEncodeLoo(df, "id", "cat", "y")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("enc")).toMap
    assert(out(1L) === 3.0)   // (7-1)/2
    assert(out(2L) === 2.5)   // (7-2)/2
    assert(out(3L) === 1.5)   // (7-4)/2
    // singleton category falls back to global LOO: (17-10)/3
    assert(math.abs(out(4L) - 7.0 / 3.0) < 1e-6)
  }

  test("mutualInfo: independent columns give 0, identical give ln k") {
    val indep = (for { a <- Seq("x", "y"); b <- Seq(0, 1); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val r0 = Encode.mutualInfo(indep, "a", "b").collect().head
    assert(r0.getAs[Double]("mi") === 0.0)
    assert(r0.getAs[Long]("n_cells") === 4L)

    val dep = (for { a <- Seq("x", "y"); _ <- 1 to 5 }
      yield (a, a)).toDF("a", "b")
    val r1 = Encode.mutualInfo(dep, "a", "b").collect().head
    assert(math.abs(r1.getAs[Double]("mi") - math.log(2.0)) < 1e-5)
  }
}
