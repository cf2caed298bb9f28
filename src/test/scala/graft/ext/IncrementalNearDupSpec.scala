package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class IncrementalNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a near-dup new doc pairs with its historical twin; novel text does not") {
    val hist = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated historical document about solar radiation data"))
    Dedup.writeMinHashStore(hist, "doc_id", "text", "t_inc_store",
      shingleN = 2, perms = 64, bands = 16)
    val batch = docs(
      (10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (11L, "genuinely novel content sharing no shingles with anything stored"))
    val found = Dedup.minHashPairsIncremental(
        batch, "doc_id", "text", "t_inc_store",
        shingleN = 2, perms = 64, bands = 16, minEst = 0.4)
      .as[(Long, Long, Double)].collect()
    assert(found.map(p => (p._1, p._2)).toSet === Set((10L, 1L)))
    assert(found.head._3 >= 0.4)
  }

  test("store side joins with ZERO Exchange (bucket partitioning is reused)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val hist = (0L until 40L).map(i => (i, s"historical doc number $i with text body $i")).toDF("doc_id", "text")
    Dedup.writeMinHashStore(hist, "doc_id", "text", "t_inc_plan",
      shingleN = 2, perms = 64, bands = 16)
    val batch = (100L until 110L).map(i => (i, s"historical doc number ${i - 100} with text body ${i - 100}")).toDF("doc_id", "text")
    val plan = Dedup.minHashPairsIncremental(
        batch, "doc_id", "text", "t_inc_plan",
        shingleN = 2, perms = 64, bands = 16, minEst = 0.1)
      .queryExecution.executedPlan
    // Store rows must flow from their scan into the consuming join with
    // no Exchange in between (shuffles ABOVE the join move candidate
    // rows — O(new batch) — and are fine). Walk every root-to-leaf
    // path; on paths ending at a store scan, the segment below the
    // last join must be exchange-free.
    def paths(p: org.apache.spark.sql.execution.SparkPlan,
        acc: List[org.apache.spark.sql.execution.SparkPlan]):
        Seq[List[org.apache.spark.sql.execution.SparkPlan]] = {
      val here = p :: acc
      if (p.children.isEmpty) Seq(here.reverse)
      else p.children.flatMap(c => paths(c, here))
    }
    val storePaths = paths(plan, Nil).filter(_.last match {
      case f: FileSourceScanExec =>
        f.tableIdentifier.exists(_.table.startsWith("t_inc_plan"))
      case _ => false
    })
    assert(storePaths.nonEmpty, s"no store scan found in plan:\n$plan")
    storePaths.foreach { path =>
      val belowJoin = path.reverse.takeWhile {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _ => true
      }
      val ex = belowJoin.collect { case e: ShuffleExchangeLike => e }
      assert(ex.isEmpty,
        s"store-side rows shuffle before their join (O(corpus), must be O(new batch)):\n$plan")
    }
    // and both store tables ARE read as bucketed scans (the bands table
    // twice: hot-bucket count + probe join, both exchange-free)
    val storeTables = plan.collect {
      case f: FileSourceScanExec if f.tableIdentifier.exists(_.table.startsWith("t_inc_plan")) =>
        f.tableIdentifier.get.table
    }
    assert(storeTables.toSet === Set("t_inc_plan_bands", "t_inc_plan_sigs"),
      s"expected both store tables in the plan:\n$plan")
  }

  test("write-time hot-bucket cap drops degenerate band keys from the store") {
    // 40 identical docs: every band bucket holds all 40 ids -> capped out
    val hist = (0L until 40L).map(i => (i, "same text every single time")).toDF("doc_id", "text")
    Dedup.writeMinHashStore(hist, "doc_id", "text", "t_inc_hot",
      shingleN = 2, perms = 64, bands = 16, maxBucket = 8)
    assert(spark.table("t_inc_hot_bands").isEmpty)
    // identical content is exactGroups' job, not LSH's — the probe then
    // finds nothing, by design
    val batch = docs((99L, "same text every single time"))
    val found = Dedup.minHashPairsIncremental(
      batch, "doc_id", "text", "t_inc_hot",
      shingleN = 2, perms = 64, bands = 16, minEst = 0.0)
    assert(found.isEmpty)
  }
}
