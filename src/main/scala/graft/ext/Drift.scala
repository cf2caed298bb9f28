package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding drift monitor: per-dimension moment comparison between a
  * reference snapshot and a new batch — the retrain/recalibrate
  * trigger for every consumer of frozen embedding structure (the IVF
  * quantizer in [[IvfStore]], SemDeDup thresholds, PCA projections).
  * A quantizer trained on last month's corpus silently loses recall as
  * the distribution walks; the drift report is what makes "frozen
  * between scheduled retrains" a monitored contract instead of a hope.
  *
  * Scale shape: one explode + (dim)-keyed partial aggregate per side —
  * the shuffle carries dim-sized groups of [[FixedPoint]] long sums,
  * never vectors; the two dim-sized tables join broadcast-free on the
  * tiny dim key. Engine-exact by the same split fixed-point contract
  * as the covariance matrix, so the oracle replays it cell by cell.
  */
object Drift {

  /** Per-dimension (mean, variance) of both frames plus the absolute
    * mean shift — rounded at `scale` as the operator's contract.
    */
  def embeddingDrift(
      base: DataFrame, batch: DataFrame, vecCol: String,
      scale: Int = 6): DataFrame = {
    import FixedPoint.{fx, hi, lo, rebuild}
    def stats(df: DataFrame, tag: String): DataFrame = {
      val v = col(vecCol).cast("array<double>")
      df.select(posexplode(v).as(Seq("dim", "v")))
        .select(col("dim").cast("long").as("dim"),
          fx(col("v")).as("__p1"), fx(col("v") * col("v")).as("__p2"))
        .groupBy(col("dim"))
        .agg(
          sum(hi(col("__p1"))).as("__h1"),
          sum(lo(col("__p1"))).as("__l1"),
          sum(hi(col("__p2"))).as("__h2"),
          sum(lo(col("__p2"))).as("__l2"),
          count(lit(1)).as("__n"))
        .select(col("dim"),
          (rebuild(col("__h1"), col("__l1")) / col("__n")).as(s"__m_$tag"),
          (rebuild(col("__h2"), col("__l2")) / col("__n")
            - (rebuild(col("__h1"), col("__l1")) / col("__n"))
            * (rebuild(col("__h1"), col("__l1")) / col("__n"))).as(s"__v_$tag"))
    }
    stats(base, "base").join(stats(batch, "batch"), "dim")
      .select(
        col("dim"),
        round(col("__m_base"), scale).as("mean_base"),
        round(col("__m_batch"), scale).as("mean_batch"),
        round(col("__v_base"), scale).as("var_base"),
        round(col("__v_batch"), scale).as("var_batch"),
        round(abs(col("__m_batch") - col("__m_base")), scale).as("mean_shift"))
  }

  /** Population Stability Index between two slices of a score/feature
    * column — THE industry model-monitoring number ("PSI > 0.2 →
    * investigate"): PSI = Σ (pₐ−p_b)·ln(pₐ/p_b) over fixed-width bins
    * on [lo, hi). [[embeddingDrift]] watches embedding moments,
    * [[Reliability]] watches calibration; PSI is the one-number
    * distribution-shift alarm between a reference window and today.
    *
    * One bins-bounded partial-agg shuffle per side; Laplace add-one on
    * bin counts makes empty bins finite deterministically (the
    * standard practice, and it keeps both engines on identical
    * operands). Terms round to 9 dp before the decimal sum. Output one
    * row: (n_a, n_b, n_bins, psi).
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int = 10): DataFrame =
    psiFromCounts(psiBinned(a, valueCol, lo, hi, bins, "ca"),
      psiBinned(b, valueCol, lo, hi, bins, "cb"), bins)

  /** The [[psi]] binning as a reusable piece: (bin, count) on the
    * [lo, hi) fixed grid — also what a STREAMING side aggregates in
    * complete mode before handing its table to [[psiFromCounts]].
    */
  def psiBinned(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int, out: String): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins must be in [2, 4096]: $bins")
    require(hi > lo, s"need hi > lo: [$lo, $hi)")
    val w = (hi - lo) / bins
    df.filter(col(valueCol).isNotNull)
      .groupBy(least(greatest(floor((round(col(valueCol), 6) - lo) / w),
        lit(0)), lit(bins - 1)).cast("long").as("bin"))
      .agg(count(lit(1)).as(out))
  }

  /** PSI from two pre-binned count tables (columns (bin, ca) and
    * (bin, cb)) — the algebra half of [[psi]], shared with the
    * streaming gate.
    */
  def psiFromCounts(aCounts: DataFrame, bCounts: DataFrame,
      bins: Int): DataFrame = {
    val allBins = aCounts.sparkSession.range(bins).select(col("id").as("bin"))
    val joined = allBins
      .join(aCounts, Seq("bin"), "left")
      .join(bCounts, Seq("bin"), "left")
      .select(col("bin"),
        (coalesce(col("ca"), lit(0L)) + 1L).as("ca1"),
        (coalesce(col("cb"), lit(0L)) + 1L).as("cb1"))
    val totals = joined.agg(sum("ca1").as("ta"), sum("cb1").as("tb"))
    joined.crossJoin(broadcast(totals))
      .select(col("ca1"), col("cb1"), col("ta"), col("tb"),
        round((col("ca1").cast("double") / col("ta") -
          col("cb1").cast("double") / col("tb")) *
          log((col("ca1").cast("double") / col("ta")) /
            (col("cb1").cast("double") / col("tb"))), 9)
          .cast("decimal(28,9)").as("term"))
      .agg(
        (sum("ca1") - lit(bins.toLong)).as("n_a"),
        (sum("cb1") - lit(bins.toLong)).as("n_b"),
        count(lit(1)).as("n_bins"),
        round(sum("term").cast("double"), 6).as("psi"))
  }

  /** Embedding GEOMETRY probe: the histogram of pairwise cosines over
    * a deterministic md5 sample — the anisotropy / collapse check
    * ([[embeddingDrift]] watches per-dimension moments move; this
    * watches the SHAPE: a healthy space has cosine mass spread below
    * 1, a collapsing encoder piles pairs near 1, and every ANN /
    * SemDeDup threshold silently degrades when that happens).
    *
    * The sample is an ABSOLUTE budget, never a rate: the `maxSample`
    * rows whose salted md5 ranks lowest (a deterministic uniform draw,
    * id tie-broken) are taken via a bounded per-partition-heap top-k
    * (TakeOrderedAndProject — no sort shuffle), so pair work is a
    * fixed maxSample²/2 at ANY corpus size. A fixed RATE here was the
    * round-8 scale bug: (rate·n)² pair work is quadratic in the
    * corpus, 100× at 10× data — the same bug class the KeyShift pin
    * killed for the ANN centroid sets, fixed the same way (the oracle
    * replays the identical ORDER BY md5 LIMIT draw). A corpus smaller
    * than the budget is sampled whole. Cosines round to 6 dp before
    * binning (engine parity), counts are exact, per-bin mean rides a
    * decimal sum. Output per non-empty bin over [-1, 1]:
    * (bin, n_pairs, mean_cos).
    */
  def cosineHistogram(df: DataFrame, idCol: String, vecCol: String,
      maxSample: Int, bins: Int = 20,
      salt: String = "geo"): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2, 1000]: $bins")
    require(maxSample >= 2 && maxSample <= 4096,
      s"maxSample must be in [2, 4096]: $maxSample")
    val sample = df
      .select(col(idCol).as("__id"),
        Similarity.asDouble(col(vecCol)).as("__v"),
        md5(concat(lit(salt), col(idCol).cast("string"))).as("__h"))
      .orderBy(col("__h"), col("__id"))
      .limit(maxSample)
      .select(col("__id"), col("__v"))
    val pairs = sample.select(col("__id").as("__ida"), col("__v").as("__va"))
      .join(broadcast(sample.select(col("__id").as("__idb"),
        col("__v").as("__vb"))), col("__ida") < col("__idb"))
      // guarded -1.0 sentinel mirrors DuckDB's list_cosine_similarity
      // on a zero-norm operand (and a raw 0/0 would THROW under the
      // sessions' ANSI default — the HOF spelling must guard BEFORE
      // the division, unlike the native codegen'd expression)
      .select(round(Similarity.cosineOrSentinel(col("__va"), col("__vb")), 6)
        .as("cos"))
    pairs
      .select(
        least(greatest(floor((col("cos") + 1.0) / 2.0 * bins), lit(0)),
          lit(bins - 1)).cast("long").as("bin"),
        col("cos").cast("decimal(18,6)").as("__c"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("__c")).cast("double") / count(lit(1)), 6)
          .as("mean_cos"))
  }
}
