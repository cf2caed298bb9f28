package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiplicative-weights domain reweighting — the DoReMi-shaped
  * mixture optimizer (Xie et al. 2023): given one scalar "excess"
  * statistic per source domain, iterate exponentiated-gradient-style
  * updates that shift sampling weight toward domains with
  * above-average excess. DoReMi's excess is a proxy-model loss gap;
  * here the statistic is any exact per-domain aggregate the pipeline
  * already computes (the gate uses mean chars/doc in integer
  * micro-units) — the OPERATOR is the update machinery, which is what
  * a pipeline swaps its own loss signal into.
  *
  * Linear-form update (w ← w·(1 + η·(ê − avg)), then renormalize)
  * instead of exp(): the exp spelling would put a libm call inside
  * the gate contract (ln/exp are not correctly-rounded-required ops —
  * the q_ext_dp_counts lesson), while the linear form is the same
  * first-order step and keeps the whole chain +,·,/ on doubles both
  * engines evaluate bit-identically given an identical expression
  * tree. η must be exactly binary-representable.
  *
  * Scale shape: ONE partial-agg shuffle to per-source sums (the
  * source domain is a design constant, |S| = 4 here); everything
  * after is a one-row expression chain — pivot, T unrolled rounds in
  * a LITERAL summation order (index 0..3, the same order the oracle
  * spells), unpivot. The data is touched exactly once.
  */
object Mixture {

  /** The gate's fixed source domain (the documents fixture ships
    * exactly these — same design constant as q_ext_mix_sources).
    */
  val Sources: Seq[String] = Seq("src0", "src1", "src2", "src3")

  val Eta: Double = 0.25 // exactly representable
  val Rounds: Int = 3

  /** Per-source micro-unit mean of `metric` (overflow-safe via the
    * DECIMAL(38,0) route), then `rounds` multiplicative-weight updates
    * from a uniform start. Output: (source, e_micro, weight) with the
    * final weight rounded to 6 dp (+0.0 signed-zero normalization —
    * weights are positive but the fleet law is unconditional).
    *
    * `sources`/`eta`/`rounds` are ARGUMENTS so the operator points at
    * any pipeline's domain set (the gate passes the [[Sources]]/
    * [[Eta]]/[[Rounds]] constants); eta's decimal spelling must
    * round-trip to the same double in both engines, which every
    * `Double.toString` does (shortest-repr), so [[oracleSql]] embeds
    * exactly that spelling.
    */
  def multiplicativeWeights(
      df: DataFrame, sourceCol: String, metric: Column,
      sources: Seq[String] = Sources, eta: Double = Eta,
      rounds: Int = Rounds): DataFrame = {
    require(sources.nonEmpty && sources.size <= 64,
      s"sources must be 1..64 domains: ${sources.size}")
    require(sources.distinct.size == sources.size, "sources must be distinct")
    // names are interpolated into stack()/oracle '$s' literals: a quote
    // or comma would produce malformed SQL or a wrong oracle (r9 ADVICE)
    sources.foreach(s => require(s.matches("^[A-Za-z0-9_.-]+$"),
      s"source name must match [A-Za-z0-9_.-]+: '$s'"))
    require(eta > 0 && eta < 1, s"eta must be in (0,1): $eta")
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16]: $rounds")
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n"), sum(metric.cast("long")).as("sm"))
      .select(col("source"),
        expr("CAST((CAST(sm AS DECIMAL(38,0)) * 1000000) DIV n AS BIGINT)")
          .as("e_micro"))
    // one-row pivot in the FIXED source order
    val pivotCols = sources.zipWithIndex.map { case (s, i) =>
      max(when(col("source") === s, col("e_micro"))).as(s"e$i")
    }
    val row = per.agg(pivotCols.head, pivotCols.tail: _*)
    val emax = sources.indices.map(i => col(s"e$i").cast("double"))
      .reduce((a, b) => greatest(a, b))
    // T unrolled rounds as CHAINED NAMED PROJECTIONS (the oracle's CTE
    // shape) — inlining each round's weights into the next as raw
    // Column trees grows the expression ~16× per round and OOMs the
    // optimizer by round 3; named columns that are referenced more
    // than once survive CollapseProject, so the plan stays linear in
    // Rounds. Summations fold in index order — the literal tree the
    // oracle mirrors.
    var frame = row
      .select(col("*") +: sources.indices.map(i =>
        (col(s"e$i").cast("double") / emax).as(s"h$i")): _*)
      .select(col("*") +: sources.indices.map(i =>
        lit(1.0 / sources.size).as(s"wr0_$i")): _*)
    (1 to rounds).foreach { r =>
      val w = sources.indices.map(i => col(s"wr${r - 1}_$i"))
      val h = sources.indices.map(i => col(s"h$i"))
      val avg = w.zip(h).map { case (wi, ei) => wi * ei }.reduce(_ + _)
      frame = frame.select(col("*"), avg.as(s"avg$r"))
      frame = frame.select(col("*") +: sources.indices.map { i =>
        (w(i) * (lit(1.0) + lit(eta) * (h(i) - col(s"avg$r"))))
          .as(s"up${r}_$i")
      }: _*)
      val norm = sources.indices.map(i => col(s"up${r}_$i")).reduce(_ + _)
      frame = frame.select(col("*"), norm.as(s"norm$r"))
      frame = frame.select(col("*") +: sources.indices.map { i =>
        (col(s"up${r}_$i") / col(s"norm$r")).as(s"wr${r}_$i")
      }: _*)
    }
    val out = frame.select(
      (sources.indices.map(i => col(s"e$i")) ++
        sources.indices.map { i =>
          (round(col(s"wr${rounds}_$i"), 6) + lit(0.0)).as(s"w$i")
        }): _*)
    // unpivot back to (source, e_micro, weight)
    val stackExpr = sources.zipWithIndex
      .map { case (s, i) => s"'$s', e$i, w$i" }
      .mkString(s"stack(${sources.size}, ", ", ", ")")
    out.selectExpr(s"$stackExpr as (source, e_micro, weight)")
  }

  /** DuckDB replay: identical pivot, identical index-ordered update
    * chain, identical constants — generated beside the operator so the
    * two spellings can never drift (the lrCtes pattern).
    */
  def oracleSql(metricSql: String, sources: Seq[String] = Sources,
      eta: Double = Eta, rounds: Int = Rounds): String = {
    val n = sources.size
    val pivot = sources.zipWithIndex.map { case (s, i) =>
      s"max(CASE WHEN source = '$s' THEN e_micro END) AS e$i"
    }.mkString(",\n        |       ")
    val emax = sources.indices.map(i => s"CAST(e$i AS DOUBLE)")
      .reduce((a, b) => s"greatest($a, $b)")
    val eh = sources.indices.map(i => s"(CAST(e$i AS DOUBLE) / em) AS h$i")
      .mkString(", ")
    // each round's weights get fresh names wr{r}_{i} (a bare `w{i}`
    // re-SELECTed per round would shadow across CTEs)
    var prev = sources.indices.map(_ => s"(1.0 / $n)")
    val chain = new StringBuilder
    (1 to rounds).foreach { r =>
      val avg = prev.zipWithIndex
        .map { case (wn, i) => s"$wn * h$i" }.reduce((a, b) => s"$a + $b")
      val ups = prev.zipWithIndex.map { case (wn, i) =>
        s"$wn * (1.0 + $eta * (h$i - ($avg)))"
      }
      val norm = ups.reduce((a, b) => s"($a) + ($b)")
      val cols = ups.zipWithIndex
        .map { case (u, i) => s"($u) / ($norm) AS wr${r}_$i" }.mkString(", ")
      chain.append(
        s",\nr$r AS (SELECT *, $cols FROM ${if (r == 1) "h" else s"r${r - 1}"})")
      prev = sources.indices.map(i => s"wr${r}_$i")
    }
    val outs = sources.zipWithIndex.map { case (s, i) =>
      s"SELECT '$s' AS source, e$i AS e_micro, " +
        s"round(wr${rounds}_$i, 6) + 0.0 AS weight FROM r$rounds"
    }.mkString("\nUNION ALL\n")
    s"""WITH per AS (
       |  SELECT source,
       |         CAST((CAST(sum($metricSql) AS HUGEINT) * 1000000)
       |              // count(*) AS BIGINT) AS e_micro
       |  FROM documents GROUP BY 1),
       |p AS (SELECT $pivot FROM per),
       |h AS (SELECT *, $eh FROM (SELECT *, $emax AS em FROM p))$chain
       |$outs""".stripMargin
  }
}
