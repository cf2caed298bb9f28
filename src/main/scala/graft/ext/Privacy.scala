package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / governance operators for a training-data pipeline:
  * k-anonymity audits (before releasing grouped data or judging
  * re-identification risk of metadata columns) and randomized-response
  * collection with exact debiasing (collecting a sensitive boolean
  * without storing anyone's true answer).
  *
  * Both are count algebra over one keyed shuffle; the randomized coins
  * are integer-hash-derived, so the whole pipeline — including the
  * "random" part — is engine-reproducible and oracle-checkable.
  */
object Privacy {

  /** k-anonymity audit over quasi-identifier columns: one row
    * (k, n_groups, n_violating, n_rows_at_risk, suppression_rate) —
    * the share of rows that would need suppression to publish the
    * table at anonymity level k. One group-by shuffle bounded by the
    * QI domain; exact integers until the one rate division.
    */
  def kAnonymity(df: DataFrame, quasiIdCols: Seq[String], k: Long): DataFrame = {
    val groups = df.groupBy(quasiIdCols.map(col): _*).agg(count(lit(1)).as("n"))
    groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).cast("long").as("n_violating"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("n_rows_at_risk"),
        sum(col("n")).cast("long").as("n_rows"))
      .select(lit(k).as("k"), col("n_groups"), col("n_violating"),
        col("n_rows_at_risk"),
        round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6)
          .as("suppression_rate"))
  }

  /** Warner randomized response with two fair hash-coins: each subject
    * reports their true bit when coin1 is heads, otherwise reports
    * coin2. P(report=1) = p/2 + 1/4, so p̂ = 2·rate − 1/2 debiases
    * exactly. Returns one row:
    * (n, true_rate, reported_rate, debiased, est_ok) where `est_ok`
    * certifies |debiased − true_rate| ≤ tolerance — the accuracy
    * contract of the mechanism at this n.
    *
    * The coins are modular integer hashes of `seedCol` (distinct salt
    * multipliers), so both engines flip IDENTICAL coins: the gate
    * checks the debiasing algebra, not luck. Production would swap the
    * hash for a real RNG; nothing else changes.
    */
  def randomizedResponse(df: DataFrame, seedCol: String, trueBit: Column,
      tolerance: Double): DataFrame = {
    def coin(mult: Long): Column =
      // seed bounded BEFORE the multiply: a replicated/offset id space
      // (the 10x scale replica) must not overflow ANSI long arithmetic
      (pmod(col(seedCol), lit(1000003L)) * mult % 1000003L) % 2 === 0
    val reported = df.select(
      trueBit.cast("int").as("b"),
      when(coin(2654435761L), trueBit.cast("int"))
        .otherwise(coin(40503L).cast("int")).as("r"))
    reported.agg(
        count(lit(1)).as("n"),
        sum("b").cast("long").as("nb"),
        sum("r").cast("long").as("nr"))
      .select(col("n"),
        round(col("nb").cast("double") / col("n"), 6).as("true_rate"),
        round(col("nr").cast("double") / col("n"), 6).as("reported_rate"),
        round(lit(2.0) * (col("nr").cast("double") / col("n")) - 0.5, 6)
          .as("debiased"),
        (abs(lit(2.0) * (col("nr").cast("double") / col("n")) - 0.5 -
          col("nb").cast("double") / col("n")) <= tolerance)
          .cast("long").as("est_ok"))
  }

  /** ε-differentially-private noisy counts per `keyCol` — the Laplace
    * mechanism over a count query (sensitivity 1, so scale = 1/ε).
    * The Laplace draw inverts the CDF of a uniform u ∈ (−½, ½):
    * `noise = −(1/ε) · sign(u) · ln(1 − 2|u|)`, with u derived from a
    * modular integer hash of the KEY (the [[randomizedResponse]] coin
    * idiom, +0.5 centering so u never reaches ±½ and ln never sees 0).
    * Production swaps the hash for a real RNG; every other line — the
    * mechanism, the scale, the ε accounting — is unchanged, and the
    * deterministic spelling is what lets the oracle replay the "noise"
    * and gate the MECHANISM (inverse-CDF algebra, per-key independence,
    * the ε→scale mapping) instead of trusting it.
    *
    * One count shuffle bounded by the key domain; noise is a per-GROUP
    * scalar expression, so the plan's cost is the count's cost. Emits
    * (key, true_n, noisy_n, noise_abs_bound_ok): true_n stays ONLY
    * because this is the audit spelling — a release would drop it.
    */
  def dpNoisyCounts(df: DataFrame, keyCol: String, eps: Double): DataFrame =
    dpRelease(df.groupBy(col(keyCol)).agg(count(lit(1)).as("true_n")),
      keyCol, "true_n", eps)

  /** The release step of [[dpNoisyCounts]], factored so STREAMED count
    * state can take the same mechanism at emission (the DP release
    * happens once, on the final counts — noise applied per micro-batch
    * would compound ε spend): `counts` is any (key, count) frame.
    */
  def dpRelease(counts: DataFrame, keyCol: String, countCol: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"epsilon must be positive, got $eps")
    // Key folded to a bounded integer seed before the multiply (ANSI
    // overflow discipline, cf. randomizedResponse): first-char code
    // point × 1009 + length is engine-portable for string keys.
    val seed = (ascii(col(keyCol)) * 1009 + length(col(keyCol))).cast("long")
    val residue = pmod(seed * 2654435761L, lit(1000003L))
    val u = (residue.cast("double") + 0.5) / 1000003.0 - 0.5
    val noise = lit(-1.0 / eps) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    // Worst |noise| at this residue grid is (1/eps)·ln(1000003) — but
    // ln is NOT an IEEE correctly-rounded-required op, so Java's
    // Math.log and the driver libm's may differ by 1 ulp; at the
    // extreme residue `abs(noise) <= bound` is an exact-equality
    // boundary that a cross-engine ulp could flip. The +1e-9 slack
    // (mirrored in the oracle) is ~1e6 ulps wide at this magnitude —
    // far above any libm disagreement, far below the next residue.
    val bound = math.log(1000003.0) / eps + 1e-9
    counts.select(
      col(keyCol),
      col(countCol).cast("long").as("true_n"),
      // decimal-pinned round (the LogReg-weight idiom) + 0.0 signed-zero
      // normalization: shrinks the 6-dp round-tie window a ln() ulp
      // could otherwise straddle
      (round((col(countCol) + noise).cast("decimal(28,15)"), 6)
        .cast("double") + lit(0.0)).as("noisy_n"),
      (abs(noise) <= bound).cast("int").as("noise_bound_ok"))
  }

  /** Right-to-erasure propagation over a [[graft.io.SnapshotTable]]:
    * commit a new snapshot of `dir` that is `fromVersion` minus every
    * row whose `keyCol` appears in `tombstones` — copy-on-write, so
    * time travel to the pre-erasure version keeps working until its
    * files are expired by retention, and the erasure itself is one
    * anti-join + write, never an in-place file mutation (the shape
    * every lakehouse DELETE takes).
    *
    * Deletion requests are bounded (a human-initiated queue), so the
    * tombstone side broadcasts and the data never shuffles for the
    * join; the write's range layout by `keyCol` is the only exchange.
    */
  def eraseKeys(spark: org.apache.spark.sql.SparkSession, dir: String,
      fromVersion: Int, toVersion: Int, keyCol: String,
      tombstones: DataFrame, numFiles: Int): Unit = {
    val base = graft.io.SnapshotTable.readSnapshot(spark, dir, fromVersion)
    val kept = base.join(
      broadcast(tombstones.select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
    graft.io.SnapshotTable.writeSnapshot(kept, dir, toVersion, keyCol,
      numFiles)
  }

  /** The erasure audit row a compliance log wants, computed from the
    * two snapshots themselves (not from what the writer CLAIMED):
    * (n_before, n_after, n_tombstoned, deleted_remaining,
    * survivors_intact) — `deleted_remaining` must be 0 and
    * `survivors_intact` pins that the new version's key-sum equals the
    * old version's minus exactly the tombstoned rows' (erasure touched
    * NOTHING else). Exact decimal sums; one aggregate per version.
    */
  /** Keyed pseudonymization: replace an identifier column by a salted
    * one-way surrogate (16-hex-char md5 prefix), preserving referential
    * structure — every table keyed on the same id maps to the same
    * surrogate, so joins and per-entity aggregates survive while the
    * raw id leaves the dataset (GDPR art. 4(5) pseudonymisation; NOT
    * anonymisation — the salt holder can re-identify, which is exactly
    * what a lawful-basis re-link needs). Pure projection: zero shuffle,
    * zero state, linear at any scale. md5 (not xxhash64) so an
    * independent engine reproduces the mapping bit-for-bit.
    */
  def pseudonymize(df: DataFrame, idCol: String, salt: String,
      outCol: String = "pseudo_id"): DataFrame =
    df.withColumn(outCol,
        substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 16))
      .drop(idCol)

  /** The audit row a pseudonymization run publishes: the surrogate must
    * be injective ON THIS DATASET (distinct ids == distinct surrogates
    * — a 64-bit-prefix collision is birthday-negligible but must be
    * CHECKED, not assumed) and the per-entity group structure must be
    * byte-identical (same multiset of group sizes, compared exactly via
    * count and sum-of-squares). All BIGINT output.
    */
  def pseudonymizeAudit(df: DataFrame, idCol: String, salt: String): DataFrame = {
    val pseudo = pseudonymize(df, idCol, salt)
    // sum-of-squares in decimal: a 10^10-row entity would overflow a
    // LONG n² under ANSI; the sq column is compare-only, never emitted
    def shape(d: DataFrame, c: String) = d.groupBy(col(c)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("groups"), sum(col("n")).as("rows"),
        sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)"))
          .as("sq"))
    val a = shape(df, idCol)
    val b = shape(pseudo, "pseudo_id")
      .withColumnRenamed("groups", "p_groups")
      .withColumnRenamed("rows", "p_rows")
      .withColumnRenamed("sq", "p_sq")
    a.crossJoin(broadcast(b))
      .select(col("rows").as("n_rows"), col("groups").as("n_ids"),
        col("p_groups").as("n_surrogates"),
        when(col("groups") === col("p_groups") && col("rows") === col("p_rows")
          && col("sq") === col("p_sq"), lit(1L)).otherwise(lit(0L))
          .as("structure_intact"))
  }

  def erasureAudit(spark: org.apache.spark.sql.SparkSession, dir: String,
      fromVersion: Int, toVersion: Int, keyCol: String,
      tombstones: DataFrame): DataFrame = {
    val keys = broadcast(tombstones.select(col(keyCol)).distinct())
    val before = graft.io.SnapshotTable.readSnapshot(spark, dir, fromVersion)
    val after = graft.io.SnapshotTable.readSnapshot(spark, dir, toVersion)
    def dsum(df: DataFrame) =
      sum(col(keyCol).cast("decimal(38,0)")).as("s")
    val b = before.agg(count(lit(1)).as("n_before"), dsum(before))
      .withColumnRenamed("s", "s_before")
    val t = before.join(keys, Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("n_tombstoned"), dsum(before))
      .withColumnRenamed("s", "s_tomb")
    val a = after.agg(count(lit(1)).as("n_after"), dsum(after))
      .withColumnRenamed("s", "s_after")
    val rem = after.join(keys, Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("deleted_remaining"))
    b.crossJoin(t).crossJoin(a).crossJoin(rem)
      .select(col("n_before"), col("n_after"), col("n_tombstoned"),
        col("deleted_remaining"),
        (col("n_after") === col("n_before") - col("n_tombstoned") &&
          coalesce(col("s_after"), lit(0).cast("decimal(38,0)")) ===
            col("s_before") -
              coalesce(col("s_tomb"), lit(0).cast("decimal(38,0)")))
          .cast("long").as("survivors_intact"))
  }
}
