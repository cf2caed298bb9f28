package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling, splitting, and source mixing — the
  * data-selection layer of a training-data pipeline (extension; the
  * reference selects by station list, `code/solrad-compare.py:21-49`,
  * which is [[graft.ops.Stations]] — this is the corpus-scale analogue).
  *
  * Why hash-based instead of `df.sample()`: the sample is a pure
  * per-row predicate — stable across reruns, retries, partitionings,
  * and engines (reproducible experiments); it pushes down to the scan
  * like any filter; adding data never reshuffles prior membership
  * (incremental corpus growth keeps yesterday's split); and the SAME
  * rows come back in any system that can compute md5, which is exactly
  * how the DuckDB oracle pins it.
  *
  * Mechanics: the first 8 hex chars of `md5(salt || key)` are compared
  * LEXICOGRAPHICALLY against a hex threshold — both engines agree on
  * lowercase-hex md5 and string ordering, so no engine-specific
  * hex→int conversion enters the contract. 8 hex digits = 32 bits of
  * uniformity, plenty for split rates; the salt decorrelates
  * independent selections over the same keys.
  */
object Sampling {

  /** Lowercase-hex 32-bit bucket of `md5(salt || key)`. */
  def hashHex(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** `floor(rate * 2^32)` as the 8-hex-digit threshold the hash is
    * compared against; rate 1.0 admits everything.
    */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate >= 1.0) "g" // sorts after every hex digit
    else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Keep ~`rate` of rows, deterministically by `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(hashHex(col(keyCol), salt) < lit(rateThreshold(rate)))

  /** Assign each row a split label by cumulative rate: `splits` maps
    * label -> fraction (must sum to ~1; the last split absorbs
    * rounding). Deterministic per key — a row's split never changes as
    * the corpus grows.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val h = hashHex(col(keyCol), salt)
    val cum = splits.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val labeled = splits.map(_._1).zip(cum).dropRight(1)
      .foldLeft(None: Option[Column]) { case (acc, (label, upper)) =>
        val cond = h < lit(rateThreshold(upper))
        Some(acc.fold(when(cond, label))(_.when(cond, label)))
      }
    val expr = labeled.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", expr)
  }

  /** Weighted source mixing: keep ~`rates(source)` of each source's
    * rows (sources absent from the map are dropped) — the "30% web,
    * 100% books" corpus-recipe operator. One codegen'd predicate, no
    * shuffle, no per-source pass.
    */
  def mixBySource(
      df: DataFrame,
      keyCol: String,
      sourceCol: String,
      rates: Map[String, Double],
      salt: String): DataFrame = {
    val h = hashHex(col(keyCol), salt)
    val threshold = rates.foldLeft(None: Option[Column]) {
      case (acc, (src, rate)) =>
        val c = col(sourceCol) === src
        Some(acc.fold(when(c, rateThreshold(rate)))(_.when(c, rateThreshold(rate))))
    }.map(_.otherwise(lit("")))
      .getOrElse(lit(""))
    df.filter(h < threshold)
  }

  /** Per-source TOKEN-budget selection: admit documents per source in
    * deterministic hash order until each source's running token total
    * reaches `budget` (the first document to cross the line is kept, so
    * every source with data gets at least one doc and the overshoot is
    * at most one document). The corpus-recipe operator when quotas are
    * token counts, not rates — one keyed window (running sum per
    * source), shuffle on the source key only.
    */
  def takeTokenBudget(
      df: DataFrame, keyCol: String, sourceCol: String, sizeCol: String,
      budget: Long, salt: String): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget " +
      "(a non-positive budget would silently break the at-least-one-doc contract)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sourceCol)
      .orderBy(hashHex(col(keyCol), salt), col(keyCol))
    df.withColumn("__cum", sum(col(sizeCol)).over(w))
      .filter(col("__cum") - col(sizeCol) < budget)
      .drop("__cum")
  }

  /** Temperature-scaled source mixing (the multilingual-sampling rule
    * of mBERT/XLM-R, p_s ∝ c_s^alpha): per-source quotas
    *
    *   n_s = max(1, floor(budget * c_s^alpha / sum_t c_t^alpha))
    *
    * alpha = 1 reproduces proportional sampling; alpha -> 0 approaches
    * uniform; 0.3-0.7 is the usual "boost the tail without drowning
    * the head" band. Every source keeps at least one row, so rare
    * sources never vanish from the mix; a quota above a source's row
    * count keeps the whole source (the mix under-fills rather than
    * over-sampling — upsampling is a repeat-epochs decision, not a
    * selection one).
    *
    * The quota computation aggregates to one row per source (partial
    * map-side count), joins back as a broadcast; selection inside each
    * source is the [[hashHex]]-ranked prefix — a per-source-partitioned
    * window, deterministic across engines, retries, and re-partitioning.
    * Only (key, source) pairs shuffle; payload columns ride along
    * untouched.
    *
    * Output: the kept rows plus their source's quota `n_target`.
    */
  def mixTemperature(
      df: DataFrame, keyCol: String, sourceCol: String,
      alpha: Double, budget: Long, salt: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("__c"))
      .withColumn("__w", pow(col("__c"), alpha))
    val wsum = counts.agg(sum(col("__w")).as("__wsum"))
    val quotas = counts.crossJoin(broadcast(wsum))
      .withColumn("n_target",
        greatest(lit(1L),
          floor(lit(budget.toDouble) * col("__w") / col("__wsum")).cast("long")))
      .select(col(sourceCol), col("n_target"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(hashHex(col(keyCol), salt), col(keyCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("n_target"))
      .drop("__rk")
  }

  /** DSIR (Xie et al. 2023, arXiv:2302.03169): data selection by
    * importance resampling. Each document is scored by how much more
    * likely its hashed-unigram bag is under the TARGET distribution
    * (rows matching `isTarget` — e.g. a trusted high-quality domain)
    * than under the RAW corpus distribution:
    *
    *   w(d) = sum over buckets b of n_db * ln(p_t(b) / p_r(b)),
    *   p_x(b) = (count_x(b) + 1) / (total_x + B)   (Laplace smoothing)
    *
    * Features are md5-prefix hash buckets (3 hex chars → B = 4096),
    * the same engine-portable bucketing as [[hashHex]] — no
    * vocabulary build, fixed feature space, exactly the paper's hashed
    * n-gram trick. Positive score = more target-like than the corpus
    * average.
    *
    * Scale shape: tokens reduce map-side to (doc, bucket, n) counts —
    * ONE shuffle keyed on (doc, bucket), then a per-doc sum that
    * re-aggregates on the doc-prefix of the same key. Both
    * distributions are <= B rows after partial aggregation and
    * broadcast back; document text never shuffles. Contributions are
    * rounded before the per-doc sum so the oracle's addition order
    * cannot move the rounded score.
    *
    * Output: (id, dsir_score) — higher = more target-like. The absolute
    * level carries a corpus-wide normalizer offset (ln((tot_r + B) /
    * (tot_t + B)) per token), so downstream selection should rank or
    * threshold RELATIVE to the score distribution ([[takeTokenBudget]] /
    * [[hashHex]] compose for the actual resampling step), not test the
    * sign.
    */
  def dsirScores(
      df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val b = 4096.0 // 16^3 buckets = 3 hex chars of md5
    val toks = df.select(col(idCol).as("id"), isTarget.as("is_target"),
        explode(TextStats.tokens(col(textCol))).as("term"))
      .withColumn("bucket", substring(md5(col("term")), 1, 3))
    val perDoc = toks.groupBy("id", "bucket").agg(count(lit(1)).as("n_db"))
    // Both distributions in ONE pass over the tokens (conditional agg),
    // and the totals fold from the bucket stats instead of re-scanning:
    // two scans of the corpus total, for any number of distributions.
    val stats = toks.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = stats.agg(
      sum(col("cr")).cast("double").as("tot_r"),
      sum(col("ct")).cast("double").as("tot_t"))
    perDoc
      .join(broadcast(stats), "bucket")
      .crossJoin(broadcast(totals))
      .withColumn("c", round(col("n_db") * log(
        ((col("ct") + 1.0) * (col("tot_r") + b)) /
          ((col("cr") + 1.0) * (col("tot_t") + b))), 7))
      .groupBy("id")
      // DECIMAL sum of the 7-dp terms, ROUNDED IN DECIMAL: a double sum
      // re-orders under partial aggregation, and rounding the sum after
      // a double cast re-introduces tie divergence (Spark rounds the
      // shortest decimal string HALF_UP, DuckDB rounds the scaled
      // binary — they disagree exactly on .xxxx5 sums; both measured at
      // sf0.1 by the round-6 SF sweep). Decimal sum + decimal round are
      // exact and tie-consistent (both round half away from zero on the
      // exact value); only then cast to double.
      .agg(round(sum(col("c").cast("decimal(28,7)")), 4).cast("double")
        .as("dsir_score"))
  }

  /** Per-stratum exact-k deterministic sample: within every stratum,
    * the k rows with the smallest `md5(salt || key)` hash win — an
    * order statistic, not a rate, so every stratum contributes EXACTLY
    * min(k, |stratum|) rows (eval sets, per-domain probes). Like
    * [[hashSample]] it is stable under reruns and corpus growth*,
    * engine-reproducible, and the ranking runs through the
    * bounded-heap top-k rewrite — no global sort, no stratum ever
    * collected. (*a new row changes membership only if it hashes into
    * the stratum's current top k — unavoidable for exact-k.)
    */
  def stratifiedK(
      df: DataFrame, strataCol: String, keyCol: String, k: Int,
      salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", hashHex(col(keyCol), salt))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  /** Neyman-optimal stratified sample allocation: split a total budget
    * `n` across strata proportional to N_h·S_h — the allocation that
    * minimizes estimator variance for a fixed n (Neyman 1934) — where
    * S_h is the per-stratum population std-dev of `valueCol`. Strata
    * with more mass AND more spread get more samples; a uniform-valued
    * stratum gets almost none regardless of size.
    *
    * Determinism contract: S_h is computed from EXACT integer moments
    * (Σx, Σx², N all BIGINT; variance = (N·Σx² − (Σx)²)/N² leaves
    * integer arithmetic only for the final division), so the double
    * sqrt is bit-identical across engines (IEEE sqrt is correctly
    * rounded); the allocation floor then sees identical doubles. The
    * integer moments bound the input: |x| ≤ ~3e4 with ≤ ~1e9 rows per
    * stratum before N·Σx² brushes int64 — at a true 100 TB fold to
    * per-partition decimal moments first.
    *
    * One partial-agg shuffle on the stratum key; the strata-table
    * total rides a broadcast single-row aggregate.
    *
    * Output: (stratum, n_rows, stddev — rounded 6, alloc — BIGINT
    * floor of the Neyman share of `n`).
    */
  def neymanAllocation(
      df: DataFrame, strataCol: String, valueCol: String,
      n: Long): DataFrame = {
    require(n > 0, s"sample budget must be positive, got $n")
    val x = col(valueCol).cast("long")
    val m = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(x).as("sx"), sum(x * x).as("sx2"))
      .withColumn("sd",
        sqrt((col("n_rows") * col("sx2") - col("sx") * col("sx"))
          .cast("double")
          / (col("n_rows").cast("double") * col("n_rows"))))
      .withColumn("w_num", col("n_rows").cast("double") * col("sd"))
    // The strata total is summed in DECIMAL(38,6), not double: a double
    // sum of irrational w_num values is ORDER-DEPENDENT (Spark's
    // partial-agg merge order is run-to-run free, DuckDB's differs too),
    // and `floor(n·w/w_total)` sits one ulp from flipping an alloc at
    // an integer boundary. Each w_num quantizes to the same micro-unit
    // decimal on both engines (a binary double can never land on a
    // .5e-6 decimal tie), decimal addition is exact and commutative,
    // and the single decimal→double cast at the end is the same nearest
    // double everywhere — the division then sees identical operands in
    // every run and engine. Oracle mirrors the spelling.
    val total = m.agg(
      sum(col("w_num").cast("decimal(38,6)")).cast("double").as("w_total"))
    m.crossJoin(broadcast(total))
      .select(col(strataCol), col("n_rows"),
        (round(col("sd"), 6) + lit(0.0)).as("stddev"),
        floor(lit(n.toDouble) * col("w_num") / col("w_total"))
          .cast("long").as("alloc"))
  }

  /** Water-filling token allocation across sources: given a per-source
    * weight table and a global `budget`, find the level L with
    * Σ min(t_s, L) = budget and allocate min(t_s, L) to each source —
    * the standard mixture solver when small domains must be kept whole
    * and only the giants capped.
    *
    * Distributed shape: sources whose covered-at-own-level total
    * P(s) + (n − k(s))·t_s fits the budget are saturated; both P (the
    * running token total in (t, source) order) and k (the running
    * count) come from [[graft.ops.PrefixSum.runningTotal]] — the
    * block-parallel scan, NOT a single-partition window — so the
    * solver holds at millions of sources. The level then solves in
    * closed form from the saturated mass (one broadcast single-row
    * aggregate); no iteration, no driver loop.
    *
    * Output: (source, tokens, allocated, rate) with
    * allocated = min(tokens, floor(L)) and rate rounded to 6.
    */
  def waterFill(
      perSource: DataFrame, sourceCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = perSource.select(col(sourceCol).as("source"),
      col(tokensCol).cast("long").as("tokens"))
    val withOne = base.withColumn("__one", lit(1L))
    val pk = graft.ops.PrefixSum.runningTotals(
      withOne, "tokens", Seq("tokens" -> "__p", "__one" -> "__k"),
      chunkSpan = 1L << 16, tieBreak = Seq("source"))
    val n = base.agg(count(lit(1)).as("__n"))
    val flagged = pk.crossJoin(broadcast(n))
      .withColumn("__sat",
        col("__p") + (col("__n") - col("__k")) * col("tokens") <= budget)
    val satAgg = flagged.agg(
      sum(when(col("__sat"), col("tokens")).otherwise(0L)).as("__psat"),
      sum(when(col("__sat"), 1L).otherwise(0L)).as("__ksat"),
      first(col("__n")).as("__n2"))
    flagged.crossJoin(broadcast(satAgg))
      .withColumn("__level",
        when(col("__ksat") === col("__n2"), lit(Long.MaxValue))
          .otherwise(floor((lit(budget) - col("__psat")).cast("double")
            / (col("__n2") - col("__ksat")))))
      .select(col("source"), col("tokens"),
        least(col("tokens"), col("__level")).cast("long").as("allocated"))
      .withColumn("rate",
        when(col("tokens") === 0, lit(0.0))
          .otherwise(round(col("allocated").cast("double")
            / col("tokens"), 6)))
  }

  /** Exact weighted sample WITHOUT replacement, size `k`, deterministic
    * (Efraimidis–Spirakis exponential keys): row i gets
    * E_i = −ln(u_i)/w_i with u_i the row's hash-uniform in (0,1), and
    * the k SMALLEST E_i win — provably the same distribution as
    * sequential draws proportional to weight. Deterministic because
    * u_i comes from the same md5 bucket as [[hashSample]], not an RNG:
    * the sample is reproducible across reruns, partitionings, and
    * engines.
    *
    * Scale shape: the key is a per-row expression; "k smallest" is
    * sort-limit, which Spark plans as TakeOrderedAndProject — a
    * per-partition bounded heap plus a k-row gather, NO global sort
    * shuffle. The final rank window orders the k surviving rows in one
    * partition (k rows by construction — fine).
    *
    * Rows with weight <= 0 or null are excluded (zero mass). Output:
    * (rank, key, weight) — the E-S key itself is NOT emitted, so an
    * engine ulp in ln() can never flip a 6-dp rounding; adjacent
    * 32-bit uniforms are ~1e-10 apart in key space, 6 orders above
    * double noise, so the ORDER is engine-stable.
    */
  def weightedSample(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val top = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es", esKey(col(keyCol), col(weightCol), salt))
      .orderBy(col("__es"), col(keyCol))
      .limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__es"), col(keyCol)))
          .cast("long"))
      .select(col("rank"), col(keyCol), col(weightCol))
  }

  /** The Efraimidis–Spirakis exponential key −ln(u)/w with u the row's
    * deterministic 32-bit hash uniform in (0,1).
    */
  private def esKey(key: Column, weight: Column, salt: String): Column = {
    val v = conv(hashHex(key, salt), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(4294967296.0)
    -log(u) / weight.cast("double")
  }

  /** [[weightedSample]] PER GROUP: k weighted winners within every
    * `groupCol` value — per-source spot-check sets, per-domain eval
    * slices. Written as the row_number-over-keyed-window + `rank <= k`
    * pattern, which [[graft.functions.RewriteWindowTopK]] rewrites into
    * the bounded-heap TopKPerKey physical operator: per (partition,
    * group) heaps of k rows, one shuffle on the group key, no full
    * per-group sort materialized.
    */
  /** Per-(key, window) admission quota: keep the first `quota` rows of
    * every key × time-bucket in (orderCol, tieBreak) arrival order —
    * crawl politeness caps, per-domain ingest budgets, API quota
    * enforcement. The `row_number <= quota` spelling lowers to the
    * bounded-heap TopKPerKey operator: one shuffle on (key, bucket),
    * per-group heaps of `quota` rows, no per-group sort.
    */
  def admitQuota(
      df: DataFrame, keys: Seq[Column], orderBy: Seq[Column],
      quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    require(keys.nonEmpty, "admitQuota needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= quota)
  }

  def weightedSamplePerKey(
      df: DataFrame, groupCol: String, keyCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__es"), col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es", esKey(col(keyCol), col(weightCol), salt))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col(keyCol), col(weightCol))
  }
}
