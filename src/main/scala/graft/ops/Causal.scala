package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment-analysis estimators beyond the raw two-sample tests:
  * CUPED variance reduction and stratified treatment-effect
  * estimation — the standard toolkit once an A/B platform outgrows
  * naive difference-in-means.
  *
  * Everything reduces to decimal-exact sufficient statistics per
  * (stratum, arm) — one partial-aggregate shuffle bounded by the
  * stratum domain — followed by identical IEEE algebra in both
  * engines.
  */
object Causal {

  private def d6(c: Column): Column = round(c, 6)

  /** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    * al. WSDM'13): variance-reduce metric `yCol` with pre-period
    * covariate `xCol` via θ = cov(x,y)/var(x) computed on the POOLED
    * data, then compare adjusted means per arm. One row:
    * (n_t, n_c, theta, delta_raw, delta_cuped, var_reduction) where
    * var_reduction = 1 − (1−ρ²) is the theoretical variance shrink
    * factor ρ² reported from the same moments.
    */
  def cuped(df: DataFrame, treatCol: Column, yCol: String, xCol: String): DataFrame = {
    val in = df.select(treatCol.as("t"),
      d6(col(yCol)).cast("decimal(18,6)").as("y"),
      d6(col(xCol)).cast("decimal(18,6)").as("x"))
    val pooled = in.agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(38,12)").as("sx"),
        sum(col("y")).cast("decimal(38,12)").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,12)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,12)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,12)")).as("syy"))
      .select(col("n"),
        ((col("sxy").cast("double") - col("sx").cast("double") *
          col("sy").cast("double") / col("n")) /
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n"))).as("theta"),
        (col("sx").cast("double") / col("n")).as("mx"),
        (((col("sxy").cast("double") - col("sx").cast("double") *
          col("sy").cast("double") / col("n")) *
          (col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n"))) /
          ((col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n")) *
            (col("syy").cast("double") - col("sy").cast("double") *
              col("sy").cast("double") / col("n")))).as("rho2"))
    val arms = in.groupBy("t").agg(
        count(lit(1)).as("na"),
        sum(col("y")).cast("double").as("sya"),
        sum(col("x")).cast("double").as("sxa"))
      .select(col("t"), col("na"),
        (col("sya") / col("na")).as("my"), (col("sxa") / col("na")).as("mxa"))
    val t = arms.filter(col("t")).select(col("na").as("n_t"),
      col("my").as("my_t"), col("mxa").as("mx_t"))
    val c = arms.filter(!col("t")).select(col("na").as("n_c"),
      col("my").as("my_c"), col("mxa").as("mx_c"))
    t.crossJoin(c).crossJoin(broadcast(pooled))
      .select(col("n_t"), col("n_c"), d6(col("theta")).as("theta"),
        d6(col("my_t") - col("my_c")).as("delta_raw"),
        d6((col("my_t") - col("theta") * (col("mx_t") - col("mx"))) -
          (col("my_c") - col("theta") * (col("mx_c") - col("mx"))))
          .as("delta_cuped"),
        d6(col("rho2")).as("var_reduction"))
  }

  /** Stratified difference-in-means: within each stratum the raw
    * treated/control means; the overall estimate weights stratum
    * effects by stratum share. Output one row per stratum plus the
    * weights, ready for the oracle to fold; all means from decimal
    * sums. (stratum, n_t, n_c, mean_t, mean_c, effect, weight)
    */
  def stratifiedEffect(df: DataFrame, stratumCol: String, treatCol: Column,
      yCol: String): DataFrame = {
    val in = df.select(col(stratumCol).as("s"), treatCol.as("t"),
      d6(col(yCol)).cast("decimal(18,6)").as("y"))
    val cells = in.groupBy("s", "t").agg(
      count(lit(1)).as("n"), sum(col("y")).cast("double").as("sy"))
    val tc = cells.filter(col("t")).select(col("s"), col("n").as("n_t"),
      (col("sy") / col("n")).as("mean_t"))
    val cc = cells.filter(!col("t")).select(col("s"), col("n").as("n_c"),
      (col("sy") / col("n")).as("mean_c"))
    val total = in.agg(count(lit(1)).as("n_all"))
    tc.join(cc, "s")
      .crossJoin(broadcast(total))
      .select(col("s"), col("n_t"), col("n_c"),
        d6(col("mean_t")).as("mean_t"), d6(col("mean_c")).as("mean_c"),
        d6(col("mean_t") - col("mean_c")).as("effect"),
        d6((col("n_t") + col("n_c")).cast("double") / col("n_all")).as("weight"))
  }

  /** Instrumental-variable Wald estimator: with a binary instrument z
    * (e.g. the encouragement/rollout flag), LATE = ITT_y / ITT_x —
    * the outcome's intent-to-treat effect scaled by the instrument's
    * actual grip on the treatment. The third causal tool beside
    * [[diffInDiff]] (needs a pre-period) and [[stratifiedEffect]]
    * (needs ignorability): IV needs neither, it needs an instrument.
    *
    * ONE two-cell decimal aggregate; a weak instrument (ITT_x = 0 at
    * 6 dp) yields null LATE rather than a division blow-up — and the
    * reported itt_x IS the weak-instrument diagnostic. Output:
    * (n_z1, n_z0, itt_y, itt_x, late).
    */
  def ivWald(df: DataFrame, instrument: Column, xCol: String,
      yCol: String): DataFrame = {
    val in = df.select(instrument.as("z"),
      d6(col(xCol)).cast("decimal(18,6)").as("x"),
      d6(col(yCol)).cast("decimal(18,6)").as("y"))
    val cells = in.groupBy("z").agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"))
    val z1 = cells.filter(col("z")).select(col("n").as("n_z1"),
      (col("sx") / col("n")).as("mx1"), (col("sy") / col("n")).as("my1"))
    val z0 = cells.filter(!col("z")).select(col("n").as("n_z0"),
      (col("sx") / col("n")).as("mx0"), (col("sy") / col("n")).as("my0"))
    z1.crossJoin(broadcast(z0))
      .select(col("n_z1"), col("n_z0"),
        d6(col("my1") - col("my0")).as("itt_y"),
        d6(col("mx1") - col("mx0")).as("itt_x"),
        when(d6(col("mx1") - col("mx0")) =!= 0.0,
          round((col("my1") - col("my0")) / (col("mx1") - col("mx0")), 6))
          .as("late"))
  }

  /** Two-period difference-in-differences: the quasi-experimental
    * estimator when assignment isn't randomized but a pre-period
    * exists — did = (ȳ_treated,post − ȳ_treated,pre) −
    * (ȳ_control,post − ȳ_control,pre), the treated group's change net
    * of the control group's trend (parallel-trends assumption; the
    * pre_gap column is the eyeball check — a large pre-period gap
    * warns the assumption is doing heavy lifting).
    *
    * ONE four-cell partial-aggregate shuffle of decimal sums; all four
    * means divide once to doubles in a fixed expression tree. Output:
    * (n_t_pre, n_t_post, n_c_pre, n_c_post, pre_gap, post_gap, did).
    */
  def diffInDiff(df: DataFrame, treatCol: Column, postCol: Column,
      yCol: String): DataFrame = {
    val in = df.select(treatCol.as("t"), postCol.as("p"),
      d6(col(yCol)).cast("decimal(18,6)").as("y"))
    val cells = in.groupBy("t", "p").agg(
      count(lit(1)).as("n"), sum(col("y")).cast("double").as("sy"))
    def cell(t: Boolean, p: Boolean, nName: String, mName: String) =
      cells.filter(col("t") === t && col("p") === p)
        .select(col("n").as(nName), (col("sy") / col("n")).as(mName))
    cell(true, false, "n_t_pre", "m_t_pre")
      .crossJoin(broadcast(cell(true, true, "n_t_post", "m_t_post")))
      .crossJoin(broadcast(cell(false, false, "n_c_pre", "m_c_pre")))
      .crossJoin(broadcast(cell(false, true, "n_c_post", "m_c_post")))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"),
        d6(col("m_t_pre") - col("m_c_pre")).as("pre_gap"),
        d6(col("m_t_post") - col("m_c_post")).as("post_gap"),
        d6((col("m_t_post") - col("m_t_pre")) -
          (col("m_c_post") - col("m_c_pre"))).as("did"))
  }
}
