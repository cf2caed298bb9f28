package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring for web-corpus curation — PageRank over
  * a (src, dst) edge list. Crawl pipelines weigh documents by the
  * authority of their host/domain (harvest priority, quality priors,
  * spam demotion); this is that signal, computed engine-portably.
  *
  * Exactness: ranks are kept in FIXED-POINT integer units (1e12 per
  * unit of mass) and every step is 64-bit floor division — no floating
  * point anywhere, so the result is bit-identical in any engine that
  * has integer division (the DuckDB oracle unrolls the same recurrence
  * with `//`). Floating-point PageRank differs across engines in the
  * last ulps because summation order differs; integer arithmetic makes
  * the contract exact instead of "within epsilon".
  *
  * Scale shape: each iteration is one shuffle join of the rank vector
  * (|V| rows, keyed by vertex) against the edge list (keyed by src —
  * a stable partitioning a production run would pre-bucket, see
  * [[graft.io.Bucketing]]) followed by one partially-aggregated sum on
  * dst. Nothing is collected to the driver; the iteration count is a
  * fixed small constant (the standard 5-20 power steps), so plan depth
  * is bounded. Contributions from dangling vertices (no out-edges) are
  * dropped — the simple power-iteration variant; total mass decays
  * slightly instead of being redistributed, which preserves ranking
  * order for curation purposes and keeps the recurrence one join.
  *
  * Overflow bound: every rank is <= SCALE (total initial mass), so the
  * inbound sum at any vertex is <= SCALE = 1e12 and `85 * sum` is
  * <= 8.5e13 — far inside Long range for any graph size.
  */
object Graph {

  /** Fixed-point scale: one unit of total rank mass = 1e12. */
  val Scale: Long = 1000000000000L

  /** Damping numerator/denominator (d = 0.85) as integers so the
    * recurrence stays in exact arithmetic.
    */
  val DampNum: Long = 85L
  val DampDen: Long = 100L

  /** PageRank over `edges` (columns `src`, `dst`; self-loops and
    * duplicate edges should be removed by the caller). Returns
    * (v, rank_e12): the fixed-point rank after `iterations` power
    * steps,
    *
    *   r0(v)   = Scale div N
    *   r_k(v)  = (15 * Scale) div (100 * N)
    *             + (85 * sum over in-edges (u,v) of r_{k-1}(u) div deg(u)) div 100
    *
    * with all divisions 64-bit floor division.
    */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // null endpoints would silently vanish inside the joins mid-iteration;
    // drop them at the door so |V| and the base term see the same graph
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // |V| rides the plan as a broadcast scalar — no driver-side count.
    // SQL `div` (not `/`) everywhere: `/` on longs is DOUBLE division,
    // whose nearest-rounding can land one above the true floor on large
    // operands; `div` is exact 64-bit integer division.
    val n = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .selectExpr("v", s"$Scale div n AS r", "n")
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(deg, "src")
        .join(ranks.select(col("v").as("src"), col("r")), "src")
        .selectExpr("dst AS v", "r div d AS c")
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      ranks = ranks.select(col("v"), col("n"))
        .join(contribs, Seq("v"), "left")
        .selectExpr("v",
          s"(${(DampDen - DampNum) * Scale} div ($DampDen * n))" +
            s" + (($DampNum * coalesce(s, 0L)) div $DampDen) AS r",
          "n")
    }
    ranks.select(col("v"), col("r").as("rank_e12"))
  }

  /** The identical recurrence as DuckDB SQL over a CTE named `edges`
    * (columns src, dst) — unrolled `iterations` times so oracle and
    * operator share one source of truth. DuckDB `//` is floor division
    * on BIGINT, = Spark's `div`/cast-after-`/` for the all-positive
    * values here; sums are cast back to BIGINT because DuckDB widens
    * SUM to HUGEINT.
    */
  def pageRankSql(iterations: Int): String = {
    require(iterations >= 1)
    val base = s"((${DampDen - DampNum} * $Scale) // ($DampDen * (SELECT n FROM nn)))"
    // AS MATERIALIZED: pins one evaluation per round under an inlining
    // CTE evaluator (the kCoreSql lesson; single-reference chains are
    // only quadratic, but the hint costs nothing and the content is
    // identical)
    val iters = (1 to iterations).map { k =>
      val prev = if (k == 1) "r0" else s"it${k - 1}"
      s"""it$k AS MATERIALIZED (
         |  SELECT nodes.v,
         |    CAST($base + ($DampNum * coalesce(c.s, 0)) // $DampDen AS BIGINT) AS r
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS v, CAST(sum(p.r // deg.d) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN $prev p ON p.v = e.src
         |    JOIN deg ON deg.src = e.src
         |    GROUP BY 1) c ON c.v = nodes.v)""".stripMargin
    }.mkString(",\n")
    s"""nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT v, CAST($Scale // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes),
       |$iters""".stripMargin
  }

  /** In/out degree per vertex — the cheap companion report (one
    * partially-aggregated shuffle per direction, outer-merged so
    * source-only and sink-only vertices both appear).
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("v")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Triangle census + global clustering coefficient over the
    * UNDIRECTED simplification of `edges` (src/dst direction, self
    * loops, and duplicates are erased first) — the local-density signal
    * link-spam and community detectors key on.
    *
    * The wedge join uses degree-ordered ORIENTATION (the MapReduce
    * classic — Suri & Vassilvitskii WWW'11 / Cohen '09): each
    * undirected edge points from its lower-(degree, id) endpoint to the
    * higher. Every triangle then has exactly one wedge at its
    * lowest-ordered vertex, and the closing edge is oriented exactly
    * low→high, so each triangle is generated ONCE and wedge fan-out at
    * vertex v is C(d⁺(v), 2) with d⁺ ≤ O(√m) — a celebrity hub with
    * degree 10⁷ contributes its √m out-wedges, not the 10¹⁴ raw pairs
    * that kill the naive spelling at crawl scale.
    *
    * Exactness: triangle/wedge/edge/vertex counts are integers; the
    * clustering coefficient 3T / wedges is the one double division,
    * identical in any engine.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("w"))
    // Wedge at u: two out-neighbours (v, w); ONLY the orientation-
    // consistent pair finds its closing edge, so no /2 correction.
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.w") =!= col("e2.w"))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.w") && col("e3.w") === col("e2.w"))
      .agg(count(lit(1)).as("n_triangles"))
    val scalars = e.agg(count(lit(1)).as("n_edges")).crossJoin(
      deg.agg(count(lit(1)).as("n_vertices"),
        sum(expr("d * (d - 1) div 2")).as("n_wedges")))
    scalars.crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3).cast("double") * col("n_triangles") / col("n_wedges"), 6))
          .as("clustering"))
  }

  /** HITS hubs-and-authorities (Kleinberg JACM'99) in the same
    * bounded-iteration fixed-point arithmetic as [[pageRank]] —
    * PageRank answers "globally endorsed", HITS answers "points at
    * good things / is pointed at by good pointers", the directed
    * bipartite view link-quality filtering wants.
    *
    *   a0 = h0 = Scale per vertex;
    *   a_k(v) = Σ over in-edges (u,v) of h_{k-1}(u), then L1-normalize
    *            to total mass Scale (decimal-widened product, floor
    *            division — exact and engine-portable);
    *   h_k(u) = Σ over out-edges (u,v) of a_k(v), normalized the same.
    *
    * Each iteration is two edge-keyed shuffle joins of the score
    * vectors plus two one-row L1 aggregates broadcast back — no
    * driver-side state. L1 (not the textbook L2) keeps normalization
    * in exact integer arithmetic; the ranking is identical since
    * normalization is a positive scalar either way. Returns
    * (v, auth_e12, hub_e12).
    */
  def hits(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    // L1-normalize `c` to total mass Scale: decimal(38,0) widens the
    // c·Scale product past Long range; DIV floors, matching DuckDB //.
    def normalized(scored: DataFrame): DataFrame = {
      val tot = scored.agg(sum(col("c")).as("tot"))
      nodes.join(scored, Seq("v"), "left")
        .crossJoin(broadcast(tot))
        .selectExpr("v",
          s"CAST((CAST(coalesce(c, CAST(0 AS BIGINT)) AS DECIMAL(38,0))" +
            s" * $Scale) DIV tot AS BIGINT) AS s")
    }
    var auth = nodes.withColumn("s", lit(Scale))
    var hub = nodes.withColumn("s", lit(Scale))
    for (_ <- 1 to iterations) {
      // localCheckpoint cuts the lineage each half-step: every
      // normalization references its input twice (mass total + join),
      // so an uncut chain doubles the plan per half-iteration — the
      // classic iterative-algorithm blowup. The checkpointed vector is
      // |V| rows distributed across executors, not driver state.
      auth = normalized(e
        .join(hub.select(col("v").as("src"), col("s")), "src")
        .groupBy(col("dst").as("v")).agg(sum(col("s")).as("c")))
        .localCheckpoint()
      hub = normalized(e
        .join(auth.select(col("v").as("dst"), col("s")), "dst")
        .groupBy(col("src").as("v")).agg(sum(col("s")).as("c")))
        .localCheckpoint()
    }
    auth.select(col("v"), col("s").as("auth_e12"))
      .join(hub.select(col("v"), col("s").as("hub_e12")), "v")
  }

  /** Newman modularity report of a vertex partition — the quality
    * number for any community assignment (dedup clusters, domain
    * groups, label propagation output): per community c,
    * contribution = e_c/m − (d_c/(2m))², and Q = Σ contributions.
    * Output per community: (community, n_vertices, e_in, d_tot,
    * contribution), with Q left to a one-row fold (the oracle sums the
    * identical 9-dp decimal terms).
    *
    * Edges are taken as given UNDIRECTED unique pairs; `membership` is
    * (v, community). Two membership joins + two bounded aggregates —
    * communities-sized output, exact integer counts, one IEEE
    * expression per row.
    */
  def modularity(edges: DataFrame, membership: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("a"),
      col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val m = e.agg(count(lit(1)).as("m"))
    val mem = membership.select(col("v").cast("long").as("v"),
      col("community").cast("long").as("c"))
    val tagged = e
      .join(mem.select(col("v").as("a"), col("c").as("ca")), "a")
      .join(mem.select(col("v").as("b"), col("c").as("cb")), "b")
    val eIn = tagged.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
    // degree counts both endpoints; self-loops would count twice,
    // callers drop them upstream (the event-graph fixtures do)
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val dTot = deg.join(mem, "v")
      .groupBy(col("c").as("community"))
      .agg(sum("d").cast("long").as("d_tot"), count(lit(1)).as("n_vertices"))
    dTot.join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_vertices"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        round(coalesce(col("e_in"), lit(0L)).cast("double") / col("m") -
          (col("d_tot").cast("double") / (lit(2.0) * col("m"))) *
          (col("d_tot").cast("double") / (lit(2.0) * col("m"))), 9)
          .as("contribution"))
  }

  /** k-core decomposition (bounded peeling): the maximal subgraph
    * where every vertex keeps ≥ k neighbours — the standard "dense
    * part of the web graph / spam farm / community scaffold" filter.
    * Treats the graph as undirected (symmetrize + dedup). Returns
    * (v, core_deg) for vertices surviving `rounds` peel rounds with
    * their within-core degree.
    *
    * Each round is one degree aggregate + two semi-join restrictions —
    * no driver-side frontier; `rounds` bounds the iteration exactly
    * like [[pageRank]]'s power steps (peeling converges in ≤ |V|
    * rounds, in practice a handful). Pure integer counts, so the
    * result is engine-exact; the oracle unrolls the identical rounds
    * via [[kCoreSql]].
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k, rounds >= 1: $k, $rounds")
    val e0 = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    var e = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("a").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("a")
      // each round references `keep` twice (both endpoints) — cut the
      // lineage per round or the plan doubles per peel (same blowup
      // as [[hits]]); the checkpointed edge set is distributed state.
      e = e.join(keep, "a").join(keep.select(col("a").as("b")), "b")
        .localCheckpoint()
    }
    e.groupBy(col("a").as("v")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
  }

  /** The identical peel rounds as DuckDB CTEs over `edges` (src, dst),
    * unrolled — one source of truth with [[kCore]]. The final core is
    * CTE `e<rounds>`.
    */
  def kCoreSql(k: Int, rounds: Int): String = {
    require(k >= 1 && rounds >= 1)
    // Every CTE is AS MATERIALIZED: each round references e_{i-1} twice
    // (degree filter + edge prune) and k_i twice (both endpoints), so an
    // INLINING evaluator re-computes the chain per reference — 2^rounds
    // blow-up. DuckDB 1.0 inlines by default, and the unmaterialized
    // spelling measured ~10 MINUTES at sf0.01 (it was the gate's single
    // slowest oracle and a sweep-stall for three rounds) vs 0.07 s
    // materialized — same rows. Materialization is evaluation-order
    // pinning only; the relational content is identical.
    val sym =
      """e0 AS MATERIALIZED (
        |  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
        |  UNION
        |  SELECT dst, src FROM edges WHERE src <> dst)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT a FROM e${i - 1} GROUP BY a HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN k$i x ON x.a = e.a JOIN k$i y ON y.a = e.b)""".stripMargin
    }.mkString(",\n")
    s"$sym,\n$iters"
  }

  /** Multi-source BFS levels: the hop distance from the nearest
    * `sources` vertex, up to `maxHops` — reachability / blast-radius /
    * crawl-frontier questions over the link graph. Returns
    * (v, level) for every REACHED vertex (level 0 = a source).
    *
    * Iterative min-relaxation in the [[pageRank]] mold: each round is
    * one edge-keyed shuffle join of the current level vector and a
    * min-aggregate — no driver-side frontier, no recursion depth tied
    * to data (maxHops bounds rounds). Levels only ever decrease and
    * are exact integers, so the result is engine-portable; the oracle
    * replays it as a bounded recursive CTE.
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    var levels = sources.select(col("v").cast("long").as("v"))
      .distinct().withColumn("level", lit(0L))
    for (_ <- 1 to maxHops) {
      val next = e
        .join(levels.select(col("v").as("src"), col("level")), "src")
        .select(col("dst").as("v"), (col("level") + 1L).as("level"))
      levels = levels.unionByName(next)
        .groupBy("v").agg(min("level").as("level"))
    }
    levels
  }

  /** The identical HITS recurrence as DuckDB SQL over a CTE named
    * `edges` (columns src, dst), unrolled `iterations` times — one
    * source of truth with [[hits]]. HUGEINT keeps the c·Scale product
    * exact; `//` floors like Spark's DIV on positives.
    */
  def hitsSql(iterations: Int): String = {
    require(iterations >= 1)
    // AS MATERIALIZED: each round references its predecessor TWICE
    // (normalizer sum + join), so an inlining evaluator re-computes the
    // chain 4^k times (the kCoreSql lesson); materialization pins one
    // evaluation per CTE, identical content
    def norm(scoresFrom: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT nodes.v,
         |    CAST((CAST(coalesce(c.c, 0) AS HUGEINT) * $Scale)
         |      // (SELECT sum(c) FROM ($scoresFrom) z) AS BIGINT) AS s
         |  FROM nodes LEFT JOIN ($scoresFrom) c ON c.v = nodes.v)""".stripMargin
    val iters = (1 to iterations).map { k =>
      val ph = if (k == 1) "h0" else s"h${k - 1}"
      val aGather =
        s"SELECT e.dst AS v, CAST(sum(p.s) AS BIGINT) AS c FROM edges e JOIN $ph p ON p.v = e.src GROUP BY 1"
      val hGather =
        s"SELECT e.src AS v, CAST(sum(p.s) AS BIGINT) AS c FROM edges e JOIN a$k p ON p.v = e.dst GROUP BY 1"
      norm(aGather, s"a$k") + ",\n" + norm(hGather, s"h$k")
    }.mkString(",\n")
    s"""nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
       |h0 AS (SELECT v, CAST($Scale AS BIGINT) AS s FROM nodes),
       |$iters""".stripMargin
  }
}
