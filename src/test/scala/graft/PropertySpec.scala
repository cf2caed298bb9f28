package graft

import java.sql.Timestamp

import graft.ext.{Dedup, TextStats}
import graft.ops.{Resample, Stations, Units}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins (SURVEY §5.4): algebraic laws the operators must
  * satisfy regardless of input. Uses ScalaCheck generators with fixed
  * seeds (scalatestplus bridge isn't in the offline cache), so runs are
  * deterministic.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  private val tsGen: Gen[Timestamp] =
    Gen.choose(1704067200000L, 1706745600000L).map(new Timestamp(_)) // Jan 2024

  private val seriesGen: Gen[List[(Timestamp, Double)]] =
    Gen.listOfN(30, Gen.zip(tsGen, Gen.choose(-1000.0, 1000.0)))

  test("resample(a ∪ b) == resample over concatenated input (partition-invariance)") {
    samples(Gen.zip(seriesGen, seriesGen), 5).foreach { case (a, b) =>
      val union = Resample.tumblingMean(
        a.toDF("time", "v").unionByName(b.toDF("time", "v")), "time", 10)
      val direct = Resample.tumblingMean((a ++ b).toDF("time", "v"), "time", 10)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("time").collect()
          .map(r => (r.getTimestamp(0), math.round(r.getDouble(1) * 1e9))).toSeq
      assert(canon(union) === canon(direct))
    }
  }

  test("unit conversion is linear: scale(x, 60) == 60 * x") {
    samples(Gen.listOfN(20, Gen.choose(-1e6, 1e6)), 5).foreach { xs =>
      val got = Units.whPerMinuteToWatts(xs.toDF("GHI")).as[Double].collect().toSeq
      assert(got === xs.map(_ * 60.0))
    }
  }

  private val nameGen: Gen[String] =
    Gen.listOfN(12, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '_', '-', '(', ')', '!'))).map(_.mkString)

  test("cleanStationName is idempotent on arbitrary strings") {
    val names = samples(nameGen, 40)
    val once = names.toDF("s").select(Stations.cleanStationName($"s").as("c"))
    val twice = once.select(Stations.cleanStationName($"c").as("c"))
    assert(once.as[String].collect().toSeq === twice.as[String].collect().toSeq)
  }

  private val textGen: Gen[String] =
    Gen.listOfN(15, Gen.oneOf("spark", "data", "the", "fast", "table", "row")).map(_.mkString(" "))

  test("word-set Jaccard is 1 on exact-dup pairs and bounded in [0,1]") {
    val texts = samples(textGen, 6)
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1, t)) // duplicate every doc
    }.toDF("doc_id", "text")
    val pairs = Dedup.wordJaccardPairs(docs, "doc_id", "text", 0.0).collect()
    assert(pairs.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    texts.indices.foreach { i =>
      val self = pairs.find(r => r.getLong(0) == i * 2L && r.getLong(1) == i * 2L + 1)
      assert(self.exists(_.getDouble(2) === 1.0))
    }
  }

  test("simHash of a permutation of tokens is identical (bag semantics)") {
    samples(textGen, 5).foreach { t =>
      val shuffled = new scala.util.Random(7).shuffle(t.split(" ").toList).mkString(" ")
      val got = Seq(t, shuffled).toDF("text")
        .select(Dedup.simHash64($"text")).as[Long].collect()
      assert(got(0) === got(1))
    }
  }

  test("tokenCount(a + ' ' + b) == tokenCount(a) + tokenCount(b)") {
    samples(Gen.zip(textGen, textGen), 5).foreach { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b").select(
        TextStats.tokenCount(concat($"a", lit(" "), $"b")).as("ab"),
        (TextStats.tokenCount($"a") + TextStats.tokenCount($"b")).as("sum")).head()
      assert(got.getInt(0) === got.getInt(1))
    }
  }

  // Changelog generator: random ops over a small key space with GLOBALLY
  // unique seq, so batch splits at any point are well-defined.
  private val changelogGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 7L), Gen.oneOf("U", "D", "I")))
      .map(_.zipWithIndex.map { case ((k, op), i) => (k, i.toLong, op) })

  test("applyChangelog: empty changelog is identity; fold over any batch split == one-shot") {
    import graft.ops.Cdc
    val base = (0L until 5L).map(i => (i, i * 10)).toDF("id", "v")
    val empty = Seq.empty[(Long, Long, String)].toDF("id", "seq", "op")
      .withColumn("v", lit(0L)).select("id", "v", "seq", "op")
    assert(Cdc.applyChangelog(base, empty, Seq("id"), "seq", "op")
      .as[(Long, Long)].collect().toSet === base.as[(Long, Long)].collect().toSet)

    samples(Gen.zip(changelogGen, Gen.choose(5, 35)), 4).foreach { case (log, cut) =>
      def df(rows: Seq[(Long, Long, String)]) =
        rows.map { case (k, seq, op) => (k, seq * 100, seq, op) }
          .toDF("id", "v", "seq", "op")
      val whole = Cdc.applyChangelog(base, df(log), Seq("id"), "seq", "op")
      val (b1, b2) = log.splitAt(cut)
      val folded = Cdc.applyChangelog(
        Cdc.applyChangelog(base, df(b1), Seq("id"), "seq", "op"),
        df(b2), Seq("id"), "seq", "op")
      assert(folded.as[(Long, Long)].collect().toSet ===
        whole.as[(Long, Long)].collect().toSet, s"cut=$cut log=$log")
    }
  }

  // ---- round-5 additions --------------------------------------------

  test("Cohen's kappa is bounded above by observed agreement and by 1") {
    val labelGen = Gen.oneOf("x", "y", "z")
    val pairsGen = Gen.listOfN(60, Gen.zip(labelGen, labelGen))
    samples(pairsGen, 8).foreach { pairs =>
      val r = graft.ext.Agreement
        .cohenKappa(pairs.toDF("a", "b"), "a", "b").collect().head
      val po = r.getDouble(2)
      if (!r.isNullAt(4)) {
        val k = r.getDouble(4)
        assert(k <= po + 1e-9, s"kappa $k above po $po")
        assert(k <= 1.0 + 1e-9 && k >= -1.0 - 1e-9)
      }
    }
  }

  test("weighted median with unit weights == exact lower median; mass halves qualify") {
    val valsGen = Gen.listOfN(25, Gen.choose(-100.0, 100.0))
    samples(valsGen, 8).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("k", v, 1L) }
        .toDF("k", "v", "w")
      val got = graft.ops.WeightedStats.weightedMedian(df, "k", "v", "w")
        .collect().head.getDouble(2)
      val sorted = vs.sorted
      // lower median: first v with 2*rank >= n
      val expect = sorted((vs.size - 1) / 2)
      assert(got === math.rint(expect * 1e6) / 1e6, s"vs=$vs")
    }
  }

  test("KMV merge identity holds for arbitrary hash multisets") {
    val hashGen = Gen.listOfN(300, Gen.choose(Long.MinValue, Long.MaxValue))
    val agg = graft.ext.Kmv.KmvAgg(32)
    samples(Gen.zip(hashGen, hashGen), 6).foreach { case (a, b) =>
      val sa = a.foldLeft(agg.zero)(agg.reduce)
      val sb = b.foldLeft(agg.zero)(agg.reduce)
      val direct = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(sa, sb).toSeq === direct.toSeq)
      assert(graft.ext.Kmv.mergeSketches(sa, sb, 32).toSeq === direct.toSeq)
    }
  }

  test("triangle census matches the naive closed-wedge count on random graphs") {
    val edgeGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
    samples(edgeGen, 5).foreach { raw =>
      val undirected = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val naive = undirected.combinations(3).count { tri =>
        val vs = tri.flatMap { case (a, b) => Seq(a, b) }.distinct
        vs.size == 3
      }
      val got = graft.ext.Graph.triangleStats(raw.toDF("src", "dst"))
        .collect().head.getLong(3)
      assert(got === naive.toLong, s"edges=$undirected")
    }
  }

  test("JSD is symmetric and bounded in [0, 1] bits on random token splits") {
    val rowsGen = Gen.listOfN(80,
      Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.oneOf(true, false)))
    samples(rowsGen, 6).foreach { rows =>
      val hasBoth = rows.exists(_._2) && rows.exists(!_._2)
      if (hasBoth) {
        def run(rs: Seq[(String, Boolean)]) = graft.ext.Divergence
          .jensenShannonTokens(rs.toDF("t", "s"), "t", "s")
          .collect().head.getDouble(3)
        val d = run(rows)
        assert(d >= -1e-9 && d <= 1.0 + 1e-9, s"jsd=$d")
        assert(d === run(rows.map { case (t, s) => (t, !s) }))
      }
    }
  }

  test("auc is partition-invariant and bounded in [0, 1]") {
    val rowsGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 1000000).map(_ / 1000000.0), Gen.oneOf(true, false)))
    samples(rowsGen, 4).foreach { rows =>
      if (rows.exists(_._2) && rows.exists(!_._2)) {
        val df = rows.toDF("score", "good")
        val a = graft.ext.RankEval.auc(df, "score", "good")
          .collect().head.getAs[Double]("auc")
        val b = graft.ext.RankEval.auc(df.repartition(13), "score", "good")
          .collect().head.getAs[Double]("auc")
        assert(a === b, "partitioning must not move the AUC")
        assert(a >= 0.0 && a <= 1.0)
      }
    }
  }

  test("histogram-store quantile estimates are monotone in q") {
    import java.sql.Timestamp
    val vGen = Gen.listOfN(200, Gen.choose(0.0, 400.0))
    samples(vGen, 3).zipWithIndex.foreach { case (vs, i) =>
      val store = s"g_prop_hist_$i"
      spark.sql(s"DROP TABLE IF EXISTS `$store`")
      val df = vs.map(v => (Timestamp.valueOf("2024-03-01 10:00:00"), v))
        .toDF("ts", "v")
      graft.ext.HistogramStore.build(df, "ts", "v", store, 0.0, 500.0, 50)
      val out = graft.ext.HistogramStore.rangeQuantiles(spark, store,
          "2024-03-01", "2024-03-01", Seq(10, 50, 90, 99), 0.0, 500.0, 50)
        .collect().map(r => r.getAs[Int]("q_pct") -> r.getAs[Double]("est"))
        .sortBy(_._1).map(_._2)
      out.sliding(2).foreach {
        case Array(lo, hi) => assert(lo <= hi, s"quantiles must be monotone: $lo > $hi")
        case _ =>
      }
    }
  }

  test("llr collocations are non-negative (G² is a deviance)") {
    val docsGen = Gen.listOfN(25, Gen.listOfN(8,
      Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    samples(docsGen, 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bad = graft.ext.Collocations.llrBigrams(docs, "id", "text", 1L)
        .collect().map(_.getAs[Double]("llr")).filter(_ < -1e-6)
      assert(bad.isEmpty, s"negative G² values: ${bad.take(3).toSeq}")
    }
  }

  test("coalesceIntervals covers exactly the union length, any partitioning") {
    val ivGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 500L),
      Gen.choose(0L, 60L)).map { case (lo, len) => (lo, lo + len) })
    samples(ivGen, 4).foreach { ivs =>
      val df = ivs.map { case (lo, hi) => ("k", lo, hi) }.toDF("k", "lo", "hi")
      def spanSum(d: org.apache.spark.sql.DataFrame) =
        graft.ops.RangeJoin.coalesceIntervals(d, Seq("k"), "lo", "hi")
          .collect().map(r => r.getAs[Long]("span_hi") - r.getAs[Long]("span_lo"))
          .sum
      // reference: closed-interval union length via integer sweep
      val covered = ivs.flatMap { case (lo, hi) => lo to hi }.toSet
      // spans count closed length hi-lo; union of points minus one per span
      val spans = spanSum(df)
      val spansRep = spanSum(df.repartition(7))
      assert(spans === spansRep, "partitioning must not change spans")
      val nSpans = graft.ops.RangeJoin
        .coalesceIntervals(df, Seq("k"), "lo", "hi").count()
      assert(spans === covered.size - nSpans,
        s"span length must equal the point-union size minus span count")
    }
  }

  test("modularity of the one-community partition is exactly zero") {
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L)))
    samples(edgeGen, 4).foreach { raw =>
      val edges = raw.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        val e = edges.toDF("src", "dst")
        val mem = e.select(col("src").as("v"))
          .union(e.select(col("dst").as("v"))).distinct()
          .withColumn("community", lit(0L))
        val q = graft.ext.Graph.modularity(e, mem)
          .collect().map(_.getAs[Double]("contribution")).sum
        assert(q === 0.0, s"e/m − (2m/2m)² must cancel exactly: $q")
      }
    }
  }
}
