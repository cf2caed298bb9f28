package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0 until 2000)
    .map(i => (i.toLong, s"src${i % 5}")).toDF("id", "source")

  test("rate thresholds: 0 admits nothing, 1 admits everything") {
    assert(Sampling.rateThreshold(0.0) === "00000000")
    assert(Sampling.hashSample(docs, "id", 0.0, "z").isEmpty)
    assert(Sampling.hashSample(docs, "id", 1.0, "z").count() === 2000L)
  }

  test("hash sample is deterministic, near-rate, and salt-decorrelated") {
    val a = Sampling.hashSample(docs, "id", 0.3, "a").select("id").as[Long].collect().toSet
    val a2 = Sampling.hashSample(docs, "id", 0.3, "a").select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "id", 0.3, "b").select("id").as[Long].collect().toSet
    assert(a === a2)
    assert(math.abs(a.size - 600) < 100, s"rate drift: ${a.size}")
    assert(a !== b)
    // independence: overlap ≈ rate² of the corpus
    assert(math.abs(a.intersect(b).size - 180) < 100)
  }

  test("assignSplit labels every row exactly once, near the requested fractions") {
    val out = Sampling.assignSplit(docs, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)
    assert(math.abs(counts("train") - 1600) < 120, counts.toString)
    assert(counts.keySet === Set("train", "val", "test"))
  }

  test("mixBySource drops unlisted sources and rates per listed source") {
    val out = Sampling.mixBySource(docs, "id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5), "mx")
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.keySet === Set("src0", "src1"))
    assert(bySrc("src0") === 400L)
    assert(math.abs(bySrc("src1") - 200) < 80)
  }

  test("takeTokenBudget: hash-ordered admission, overshoot at most one doc") {
    def md5hex8(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(8)
    }
    val sized = (0L until 100L).map(i => (i, s"src${i % 2}", 10L + i % 7))
    val df = sized.toDF("id", "source", "sz")
    val budget = 120L
    val got = Sampling.takeTokenBudget(df, "id", "source", "sz", budget, "tb")
      .select("id").as[Long].collect().toSet
    // expected: replay the same hash order per source in plain Scala
    val expected = sized.groupBy(_._2).values.flatMap { rows =>
      val ordered = rows.sortBy { case (id, _, _) => (md5hex8("tb" + id), id) }
      val cum = ordered.scanLeft(0L)(_ + _._3).init // running total BEFORE each doc
      ordered.zip(cum).collect { case ((id, _, _), before) if before < budget => id }
    }.toSet
    assert(got === expected)
    // each source keeps at least one doc and stops within one doc of budget
    val kept = sized.filter(r => got(r._1)).groupBy(_._2)
    kept.foreach { case (_, rows) =>
      val total = rows.map(_._3).sum
      assert(rows.nonEmpty && total - rows.map(_._3).max < budget)
    }
  }

  test("mixTemperature boosts tail sources vs proportional sampling") {
    // 80 head rows vs 20 tail rows; budget 50.
    // alpha=1 (proportional): tail quota = floor(50*20/100) = 10.
    // alpha=0.5: tail quota = floor(50*sqrt(20)/(sqrt(80)+sqrt(20))) = 16.
    val df = ((1 to 80).map(i => (i.toLong, "head")) ++
      (81 to 100).map(i => (i.toLong, "tail"))).toDF("id", "src")
    val prop = Sampling.mixTemperature(df, "id", "src", 1.0, 50L, "x")
      .filter($"src" === "tail").count()
    val temp = Sampling.mixTemperature(df, "id", "src", 0.5, 50L, "x")
      .filter($"src" === "tail").count()
    assert(prop === 10L)
    assert(temp === 16L)
  }

  test("mixTemperature keeps at least one row per source and is stable") {
    val df = ((1 to 99).map(i => (i.toLong, "big")) ++ Seq((100L, "rare")))
      .toDF("id", "src")
    val kept = Sampling.mixTemperature(df, "id", "src", 0.5, 10L, "s1")
    assert(kept.filter($"src" === "rare").count() === 1L,
      "a one-row source must survive any mix")
    // determinism: same salt -> same rows
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.mixTemperature(df, "id", "src", 0.5, 10L, "s1")
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("dsirScores ranks target-vocabulary docs above off-target docs") {
    // Target docs speak "physics"; raw background speaks "celebrity".
    // A fresh doc in target vocabulary must outscore one in background
    // vocabulary — the whole point of importance weighting.
    val df = Seq(
      (1L, "quark lepton boson quark", true),
      (2L, "quark boson hadron lepton", true),
      (3L, "gossip scandal tabloid fame", false),
      (4L, "gossip fame scandal tabloid", false),
      (5L, "quark hadron lepton boson", false),  // target-like, unlabeled
      (6L, "tabloid gossip fame scandal", false) // background-like
    ).toDF("id", "text", "tgt")
    val got = Sampling.dsirScores(df, "id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(5L) > got(6L),
      s"target-vocab doc must outscore background doc: $got")
    assert(got(1L) > got(3L))
  }

  test("dsirScores is invariant to token order and scales with length") {
    val df = Seq(
      (1L, "a b", true),
      (2L, "b a", false),      // same bag as 1 -> identical score
      (3L, "a b a b", false)   // doubled bag
    ).toDF("id", "text", "tgt")
    val got = Sampling.dsirScores(df, "id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === got(2L))
    assert(math.abs(got(3L) - 2 * got(1L)) < 1e-3,
      "doubling every count doubles the log-ratio sum (up to rounding)")
  }

  test("stratifiedK takes exactly min(k, size) per stratum, deterministically") {
    val df = (1L to 20L).map(i => (i, if (i <= 15) "big" else "small"))
      .toDF("id", "stratum")
    val a = Sampling.stratifiedK(df, "stratum", "id", 4, "s")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Sampling.stratifiedK(df, "stratum", "id", 4, "s")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSet === b.toSet, "same salt -> same sample")
    assert(a.count(_._2 === "big") === 4)
    assert(a.count(_._2 === "small") === 4)
    val other = Sampling.stratifiedK(df, "stratum", "id", 4, "t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(other !== a.toSet, "a different salt draws a different sample")
  }

  test("waterFill: small sources whole, giants capped at the level") {
    // totals 10+20+100+100 = 230, budget 90:
    // 10 saturates (10 + 3*10 = 40 <= 90); 20 saturates (10+3*20=70 <= 90);
    // level = (90-30)/2 = 30 -> the two 100s get 30 each. Sum = 90.
    val per = Seq(("a", 10L), ("b", 20L), ("c", 100L), ("d", 100L))
      .toDF("source", "tokens")
    val got = Sampling.waterFill(per, "source", "tokens", budget = 90L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("a") === ((10L, 10L, 1.0)))
    assert(got("b") === ((20L, 20L, 1.0)))
    assert(got("c") === ((100L, 30L, 0.3)))
    assert(got("d") === ((100L, 30L, 0.3)))
  }

  test("waterFill: budget >= total saturates everything; budget 0 allocates 0") {
    val per = Seq(("a", 5L), ("b", 7L)).toDF("source", "tokens")
    val all = Sampling.waterFill(per, "source", "tokens", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all === Map("a" -> 5L, "b" -> 7L))
    val none = Sampling.waterFill(per, "source", "tokens", 0L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(none === Map("a" -> 0L, "b" -> 0L))
  }

  test("waterFill splits a non-integral level by flooring") {
    // budget 10 over two 100s: level 5 each; over three 100s: floor(10/3)=3.
    val got = Sampling.waterFill(
      Seq(("x", 100L), ("y", 100L), ("z", 100L)).toDF("source", "tokens"),
      "source", "tokens", 10L)
      .collect().map(_.getLong(2)).toSeq
    assert(got === Seq(3L, 3L, 3L))
  }

  test("weightedSample: k rows, deterministic, zero/null weights excluded") {
    val df = (1 to 200).map(i => (i.toLong, if (i % 50 == 0) 0.0 else i.toDouble))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 20, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Sampling.weightedSample(df, "id", "w", k = 20, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.length === 20 && a.toSeq === b.toSeq)
    assert(a.map(_._1).toSeq === (1L to 20L)) // ranks dense 1..k
    assert(a.forall { case (_, id) => id % 50 != 0 }) // zero-weight never sampled
    intercept[IllegalArgumentException](
      Sampling.weightedSample(df, "id", "w", k = 0, salt = "t"))
  }

  test("weightedSample with equal weights reduces to the top-k hash uniforms") {
    // es = -ln(u)/c is strictly decreasing in u, so the k smallest keys
    // are exactly the k LARGEST hash uniforms — the same order
    // hashSample's lexicographic hex comparison induces.
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 10, salt = "eq")
      .collect().map(_.getLong(1)).toSet
    val expect = df
      .withColumn("h", Sampling.hashHex(col("id"), "eq"))
      .orderBy(col("h").desc, col("id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("weightedSamplePerKey: k winners per group via the bounded-heap rewrite") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong, (i % 7 + 1).toDouble))
      .toDF("g", "id", "w")
    val out = Sampling.weightedSamplePerKey(df, "g", "id", "w", k = 4, salt = "pk")
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 12) // 3 groups x 4 winners
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L) })
    // the row_number window spelling must hit the TopKPerKey rewrite,
    // not a full per-group sort window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"grouped weighted sample did not rewrite to TopKPerKey:\n$plan")
  }

  test("weightedSample skews toward heavy rows: a 100x weight is " +
      "overwhelmingly more likely in-sample than a 1x weight") {
    // 20 heavy rows (w=100) among 180 light (w=1): E[heavy in top-40]
    // dominates; with this fixed salt the heavy set lands >= 18/20.
    val df = (1 to 200).map(i => (i.toLong, if (i <= 20) 100.0 else 1.0))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 40, salt = "skew")
      .collect().map(_.getLong(1))
    val heavyIn = got.count(_ <= 20)
    assert(heavyIn >= 18, s"only $heavyIn/20 heavy rows sampled")
  }

  test("neymanAllocation: spread earns samples, uniform strata earn none") {
    // stratum a: values {0, 10} -> sd = 5, N = 2 -> weight 10
    // stratum b: constant 5     -> sd = 0, N = 4 -> weight 0
    val df = Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 5L), ("b", 5L),
      ("b", 5L)).toDF("stratum", "v")
    val got = Sampling.neymanAllocation(df, "stratum", "v", n = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("stddev"),
          r.getAs[Long]("alloc"))).toMap
    assert(got("a") === ((2L, 5.0, 100L)))
    assert(got("b") === ((4L, 0.0, 0L)))
  }

  test("neymanAllocation: proportional when all strata share the spread") {
    // equal sd, sizes 1:3 -> allocations split 25/75 exactly
    val df = (Seq(("a", 0L), ("a", 2L)) ++
      Seq.fill(3)(Seq(("b", 10L), ("b", 12L))).flatten).toDF("stratum", "v")
    val got = Sampling.neymanAllocation(df, "stratum", "v", n = 100L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    assert(got("a") === 25L && got("b") === 75L)
  }
}
