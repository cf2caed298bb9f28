package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — collapse near-identical entity
  * records ("IRAN" / "The IRAN" / "IRANs") to one canonical id. The
  * classic three-stage shape (Fellegi–Sunter lineage, the blocking
  * form every production ER system uses):
  *
  *   1. NORMALIZE each record's name (case/punctuation erased) — a
  *      per-row codegen'd expression, zero shuffle;
  *   2. BLOCK on a cheap key (normalized prefix): candidate pairs are
  *      generated only WITHIN a block, so pair work is Σ|block|²
  *      instead of n² — the same all-pairs-killer as LSH banding for
  *      documents ([[Dedup.minHashPairs]]), with the same recall
  *      trade: a corruption that changes the block key (here, a
  *      prefixed word) is invisible, which the gate fixture
  *      deliberately includes;
  *   3. MATCH by edit distance on the bounded candidate set (codegen'd
  *      `levenshtein`, the [[Dedup.verifyByEditDistance]] tier), then
  *      TRANSITIVE-CLOSE matches into entities with the
  *      diameter-independent [[Clusters.connectedComponents]].
  *
  * Exactness: normalization, blocking, the distance threshold and the
  * closure are all engine-portable (the oracle replays them verbatim,
  * closure as a recursive CTE), so the entity table is hash-exact.
  */
object EntityResolution {

  /** Case/punctuation-blind canonical form (codegen'd, per-row). */
  def normalize(name: Column): Column =
    regexp_replace(lower(name), "[^a-z0-9]", "")

  /** Resolve records (idCol, nameCol) → entity clusters:
    * (entity_id = min member id, n_members, id_sum). Singletons are
    * not entities and are omitted (their id IS their identity).
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
      blockLen: Int = 3, maxDist: Int = 2): DataFrame = {
    val recs = df.select(col(idCol).cast("long").as("id"),
        normalize(col(nameCol)).as("norm"))
      .withColumn("blk", substring(col("norm"), 1, blockLen))
    val a = recs.select(col("id").as("id_a"), col("norm").as("na"), col("blk"))
    val b = recs.select(col("id").as("id_b"), col("norm").as("nb"),
      col("blk").as("blk_b"))
    val pairs = a
      .join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .filter(levenshtein(col("na"), col("nb")) <= maxDist)
      .select(col("id_a"), col("id_b"))
    Clusters.connectedComponents(pairs, "id_a", "id_b")
      .groupBy(col("cluster").as("entity_id"))
      .agg(count(lit(1)).as("n_members"), sum(col("node")).as("id_sum"))
      .filter(col("n_members") >= 2)
  }
}
