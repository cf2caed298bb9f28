package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical two-sample / rank statistics as distributed aggregates.
  *
  * The reference's analysis loop ends at linregress + bias
  * (code/process-cams-solrad-ts.py:214-230 in the reference); a
  * production monitoring pipeline additionally needs distribution
  * COMPARISON: "did this station's distribution shift vs that one /
  * vs last month" (KS, Mann-Whitney), "are these series monotonically
  * related" (Spearman), "are the group means different given unequal
  * variances" (Welch). All four reduce to sufficient statistics that
  * are exact in integer / decimal arithmetic, so both engines compute
  * bit-identical values and the one double formula at the end is
  * IEEE-deterministic:
  *
  *  - ranks: for a value with strict-prefix count p and tie count t,
  *    twice the average rank is the INTEGER 2p + t + 1 — every rank
  *    statistic below works on that doubled-integer scale and divides
  *    by 2 only in the final double step;
  *  - moments: sums of `round(x, 6)` through `decimal(38,12)`.
  *
  * Scale shape: everything is (a) a group-by on the value domain
  * (shuffle bounded by distinct values), then (b) a prefix sum —
  * per-key window where the statistic is keyed, [[PrefixSum]]'s
  * chunked scan where it is global — then (c) a scalar aggregate.
  * No step buffers a group in memory.
  */
object StatTests {

  private def d6(c: Column): Column = round(c, 6)

  /** Exact decimal sum surfaced as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(38,12)")).cast("double")

  /** Two-sample Kolmogorov-Smirnov D between `valueCol` of rows where
    * `isA` and the rest. Returns one row:
    * (n_a, n_b, ks_d, d_at) where `d_at` is the smallest value
    * location attaining the supremum.
    *
    * The CDF difference only changes at observed values, so the scan
    * runs over DISTINCT values (group-by first — shuffle bounded by
    * the value domain), and the global cumulative counts come from
    * [[PrefixSum.runningTotals]]'s chunked scan — no single-partition
    * window anywhere, so the 100 TB shape is two bounded shuffles.
    * Counts are exact longs; D is the max of exact-operand IEEE
    * divisions, reproducible across engines.
    */
  def ksTwoSample(df: DataFrame, valueCol: String, isA: Column,
      chunkSpan: Long = 16L): DataFrame = {
    val perValue = df
      .select(col(valueCol).as("v"), isA.cast("int").as("a"))
      .groupBy("v")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
    val scanned = PrefixSum.runningTotals(
      perValue, "v", Seq("ca" -> "pa", "cb" -> "pb"), chunkSpan)
      // group totals are a one-row scalar aggregate, broadcast back —
      // never an unpartitioned window over the scan
      .crossJoin(broadcast(
        perValue.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))))
      // inclusive cumulative = strict prefix + own tie count
      .withColumn("diff",
        abs((col("pa") + col("ca")).cast("double") / col("n_a") -
          (col("pb") + col("cb")).cast("double") / col("n_b")))
    scanned
      .crossJoin(broadcast(scanned.agg(max(col("diff")).as("d"))))
      .filter(col("diff") === col("d"))
      .groupBy(col("n_a"), col("n_b"), d6(col("d")).as("ks_d"))
      .agg(d6(min(col("v"))).as("d_at"))
  }

  /** Mann-Whitney U (two-sided, normal approximation with tie
    * correction) between group `isA` and the rest. One row:
    * (n_a, n_b, u_a, u_b, z). `u_a` counts pairs where an A value
    * beats a B value (ties half) — exact to .5 via the doubled-rank
    * integers; z's variance uses the standard Σ(t³−t) tie term.
    *
    * Same scan shape as [[ksTwoSample]]: group-by value, one chunked
    * prefix sum, one scalar aggregate.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, isA: Column,
      chunkSpan: Long = 16L): DataFrame = {
    val perValue = df
      .select(col(valueCol).as("v"), isA.cast("int").as("a"))
      .groupBy("v")
      .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val scanned = PrefixSum.runningTotal(perValue, "v", "t", "p", chunkSpan)
    val agg = scanned.agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      // Σ over A-members of 2·avgrank = Σ ca·(2p + t + 1), exact.
      sum(col("ca").cast("decimal(38,0)") *
        (lit(2) * col("p") + col("t") + lit(1))).as("r2a"),
      sum((col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)")).as("ties"))
    agg.select(
      col("n_a"), col("n_b"),
      // U_A = R_A − nA(nA+1)/2 on the doubled scale, halved once.
      ((col("r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + lit(1)))
        .cast("double") / 2.0).as("u_a"),
      col("r2a"), col("ties"))
      .withColumn("u_b",
        col("n_a").cast("double") * col("n_b") - col("u_a"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("mu", col("n_a").cast("double") * col("n_b") / 2.0)
      .withColumn("var",
        col("n_a").cast("double") * col("n_b") / 12.0 *
          ((col("n") + lit(1)).cast("double") -
            col("ties").cast("double") /
              (col("n").cast("double") * (col("n") - lit(1)))))
      .select(col("n_a"), col("n_b"), d6(col("u_a")).as("u_a"),
        d6(col("u_b")).as("u_b"),
        d6((col("u_a") - col("mu")) / sqrt(col("var"))).as("z"))
  }

  /** Per-key Spearman rank correlation between `xCol` and `yCol`.
    * Returns (key, n, rho) with average-rank tie handling.
    *
    * Doubled average ranks 2p+t+1 are integers, so every sufficient
    * statistic (Σx, Σy, Σxy, Σx², Σy² on the doubled scale) is an
    * exact decimal and both engines agree bit-for-bit before the one
    * double formula. Ranks are per-key windows — the keyed-window
    * scale story ([[ChunkedWindow]]) applies when one key outgrows a
    * partition.
    */
  def spearman(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    def ranked2(c: String): Column = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(c))
      val ties = Window.partitionBy(col(keyCol), col(c))
      // rank() = strict-prefix + 1 ⇒ 2·avgrank = 2·rank + ties − 1
      (lit(2) * rank().over(w) + count(lit(1)).over(ties) - lit(1))
        .cast("decimal(38,0)")
    }
    df.select(col(keyCol), col(xCol), col(yCol))
      .withColumn("rx", ranked2(xCol))
      .withColumn("ry", ranked2(yCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .select({
        val vx = col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val vy = col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        val num = col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        Seq(col(keyCol), col("n"),
          when(vx > 0 && vy > 0, d6(num / sqrt(vx * vy))).as("rho"))
      }: _*)
  }

  /** Welch's unequal-variance t between group `isA` and the rest:
    * one row (n_a, n_b, mean_a, mean_b, t, df) with the
    * Welch-Satterthwaite degrees of freedom. Values are rounded to
    * 6 dp on entry and summed in decimals, so the moments are exact;
    * one partial-aggregate shuffle total.
    */
  def welchT(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    val v = d6(col(valueCol)).cast("decimal(18,6)")
    val grouped = df
      .select(isA.as("ga"), v.as("v"))
      .groupBy("ga")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast("decimal(38,12)").as("s1"),
        sum((col("v") * col("v")).cast("decimal(38,12)")).as("s2"))
      .select(col("ga"), col("n"),
        (col("s1").cast("double") / col("n")).as("m"),
        // unbiased variance: exact decimal s1/s2, one double algebra step
        ((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n")) /
          (col("n") - lit(1))).as("s2v"))
    val a = grouped.filter(col("ga")).select(
      col("n").as("n_a"), col("m").as("m_a"), col("s2v").as("v_a"))
    val b = grouped.filter(!col("ga")).select(
      col("n").as("n_b"), col("m").as("m_b"), col("s2v").as("v_b"))
    a.crossJoin(b)
      .withColumn("se2", col("v_a") / col("n_a") + col("v_b") / col("n_b"))
      .select(
        col("n_a"), col("n_b"), d6(col("m_a")).as("mean_a"),
        d6(col("m_b")).as("mean_b"),
        d6((col("m_a") - col("m_b")) / sqrt(col("se2"))).as("t"),
        d6(col("se2") * col("se2") /
          (col("v_a") * col("v_a") / (col("n_a") * col("n_a") * (col("n_a") - lit(1))) +
            col("v_b") * col("v_b") / (col("n_b") * col("n_b") * (col("n_b") - lit(1)))))
          .as("df"))
  }

  /** Chi-squared goodness-of-fit of a categorical column against
    * expected shares — the "is my hash split actually 80/10/10" QA
    * check for [[graft.ext.Sampling]]'s assignments. `expected` maps
    * category → share (shares must sum to 1; categories observed but
    * not expected fail loudly rather than skewing the statistic).
    *
    * One category-bounded partial-agg shuffle; observed counts are
    * exact longs, expected counts one multiply each, and the χ² sum
    * runs over 9-dp-rounded decimal terms so accumulation order can't
    * move the 6-dp result. Output: (n, k, chi2, df).
    */
  def gofChiSquare(df: DataFrame, catCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "expected shares must be non-empty")
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"expected shares must sum to 1: $expected")
    val shares = expected.map { case (c, p) =>
      struct(lit(c).as("cat"), lit(p).as("p"))
    }
    val sharesDf = df.sparkSession.range(1)
      .select(explode(array(shares: _*)).as("s"))
      .select(col("s.cat").as("cat"), col("s.p").as("p"))
    val obs = df.select(col(catCol).cast("string").as("cat"))
      .groupBy("cat").agg(count(lit(1)).as("o"))
    val n = obs.agg(sum("o").as("n"))
    val joined = obs.join(broadcast(sharesDf), Seq("cat"), "full_outer")
      .crossJoin(broadcast(n))
    joined.agg(
        max(when(col("p").isNull, col("cat"))).as("_unexpected"),
        sum(
          round((coalesce(col("o"), lit(0L)).cast("double") -
            col("p") * col("n")) *
            (coalesce(col("o"), lit(0L)).cast("double") - col("p") * col("n")) /
            (col("p") * col("n")), 9).cast("decimal(28,9)")).as("_chi2"),
        max(col("n")).as("n"), count(when(col("p").isNotNull, 1)).as("k"))
      .select(col("n"), col("k"),
        when(col("_unexpected").isNotNull, lit(null).cast("double"))
          .otherwise(d6(col("_chi2").cast("double"))).as("chi2"),
        (col("k") - lit(1)).as("df"))
  }
}
