package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IvfStoreSpec extends SparkTestBase {
  import spark.implicits._

  // Two tight clusters around orthogonal axes: assignment is unambiguous.
  private def vecs(rows: (Long, Array[Double])*) = rows.toDF("id", "vec")

  private def cluster(center: Array[Double], id: Long): (Long, Array[Double]) =
    (id, center.map(_ + (id % 3) * 0.01))

  private def fixture = {
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    vecs((0L to 9L).map(i => cluster(if (i % 2 == 0) a else b, i)): _*)
  }

  test("build + ingest equals assigning the union against the frozen centroids") {
    val base = fixture.filter($"id" < 6)
    val batch = fixture.filter($"id" >= 6)
    val cents = vecs(
      (100L, Array(1.0, 0.0, 0.0, 0.0)), (200L, Array(0.0, 1.0, 0.0, 0.0)))
    IvfStore.build(base, cents, "t_ivf_spec", buckets = 2)
    IvfStore.ingest(batch, "t_ivf_spec", buckets = 2)
    val stored = spark.table("t_ivf_spec_postings")
      .select("id", "cell").as[(Long, Long)].collect().toSet
    val direct = IvfStore.assign(fixture, cents)
      .select("id", "cell").as[(Long, Long)].collect().toSet
    assert(stored === direct)
    // even ids hug axis a -> centroid 100; odd -> 200
    assert(stored.forall { case (id, cell) =>
      cell == (if (id % 2 == 0) 100L else 200L) })
  }

  test("searchStore finds same-cluster neighbors through the persisted index") {
    val cents = vecs(
      (100L, Array(1.0, 0.0, 0.0, 0.0)), (200L, Array(0.0, 1.0, 0.0, 0.0)))
    IvfStore.build(fixture, cents, "t_ivf_search", buckets = 2)
    val queries = fixture.filter($"id" === 0L)
    val got = IvfStore.searchStore(spark, queries, "t_ivf_search",
      k = 2, nProbe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    // nProbe=1 restricts to the even (axis-a) cell; neighbors are even
    assert(got.nonEmpty && got.forall(_ % 2 == 0) && !got.contains(0L))
  }

  test("ingest work is O(batch): the postings store is not rescanned") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val base = (0L until 40L).map(i =>
      (i, Array(i.toDouble % 5 + 1, (i % 7).toDouble, 1.0, 0.5))).toDF("id", "vec")
    val cents = (0L until 4L).map(i =>
      (1000L + i, Array(i.toDouble + 1, 1.0, 1.0, 0.5))).toDF("id", "vec")
    IvfStore.build(base, cents, "t_ivf_plan", buckets = 2)
    val batch = (100L until 105L).map(i =>
      (i, Array(i.toDouble % 5 + 1, (i % 7).toDouble, 1.0, 0.5))).toDF("id", "vec")
    // the ingest plan reads ONLY the centroid table (2 scans total:
    // batch + centroids) — a postings scan would mean the store is
    // rebuilt, not appended
    val centsTable = s.table("t_ivf_plan_centroids")
    val plan = IvfStore.assign(batch.as("b"), centsTable)
      .queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(!scans.exists(_.tableIdentifier.exists(_.table.contains("postings"))),
      s"ingest assignment scans the postings store:\n$plan")
  }
}
