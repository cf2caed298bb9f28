package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation / interaction-log assembly: turn event streams into
  * ordered per-session transcripts — the terminal shaping step of a
  * chat-style training-data pipeline (raw telemetry in, one training
  * example per session out).
  *
  * Scale shape: ONE shuffle. The session-id window partitions by user;
  * the downstream per-(user, session) aggregation is satisfied by the
  * same hash partitioning (ClusteredDistribution on a superset key —
  * Catalyst inserts no second exchange; `PlanBudgetSpec` pins this).
  * Turn text rides map-side into `collect_list` structs whose
  * array_sort is per-session, bounded by session length — never a
  * global sort. Truncation to `maxTurns` happens AFTER assembly via
  * `slice`, so the count of dropped turns is retained (the alternative
  * — filter-then-assemble — silently loses how long sessions really
  * were, which downstream curriculum sampling wants to know).
  */
object Assembly {

  /** Assemble per-(user, session) transcripts. Sessions split on
    * event-time gaps > `gapSec`. Each turn renders as
    * `<turnText>#<seqId>` ordered by (time, seq); transcripts keep the
    * first `maxTurns` turns and flag the cut.
    *
    * `tsSec`: event time in epoch seconds; `seqId`: a unique
    * tie-breaker (event id) making turn order total and
    * engine-portable.
    *
    * Output: (user, session_id, n_turns, start_sec, end_sec,
    * transcript, truncated).
    */
  def conversations(
      events: DataFrame, userCol: String, tsSec: Column, seqId: Column,
      turnText: Column, gapSec: Long, maxTurns: Int): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    require(maxTurns > 0, s"maxTurns must be positive, got $maxTurns")
    val byUser = Window.partitionBy(userCol).orderBy(col("sec"), col("seq"))
    val e = events.select(col(userCol), tsSec.as("sec"), seqId.as("seq"),
      concat(turnText, lit("#"), seqId.cast("string")).as("turn"))
    val sessioned = e
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > gapSec, 1)
          .otherwise(lit(0)))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser).cast("long"))
    sessioned
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec"),
        array_sort(collect_list(struct(col("sec"), col("seq"), col("turn"))))
          .as("__ts"))
      .withColumn("transcript",
        array_join(transform(slice(col("__ts"), 1, maxTurns),
          x => x("turn")), " "))
      .withColumn("truncated", (col("n_turns") > maxTurns).cast("long"))
      .drop("__ts")
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4), the
    * denoising-objective shaping step: the token stream is cut into
    * fixed-length blocks and a deterministic ~`rate` of blocks is
    * replaced by sentinels in the input, with the masked blocks
    * emitted (sentinel-prefixed) as the target. Differences from the
    * paper's sampler, chosen for engine-portable determinism: spans
    * are grid-aligned (exactly `spanLen` tokens, the mean length the
    * paper samples around) and the mask decision is a salted md5 of
    * (id, block) compared to a hex threshold — the [[Sampling.hashHex]]
    * trick, so the SAME example set reproduces on any engine, any
    * partitioning, any rerun. Sentinels are numbered by block index
    * (stable) rather than sequentially.
    *
    * Pure per-row HOF expressions — zero shuffle. Cost note: the
    * slice-per-block lambda re-derives O(blocks × spanLen) = O(tokens)
    * work per row (the [[TextStats.chunkTokens]] pattern).
    */
  def spanCorrupt(
      df: DataFrame, idCol: String, textCol: String,
      spanLen: Int, rateHex: String, salt: String): DataFrame = {
    require(spanLen >= 1, s"spanLen must be positive, got $spanLen")
    require(rateHex.matches("[0-9a-f]{8}"), s"rateHex must be 8 lowercase hex: $rateHex")
    val toks = TextStats.tokens(col(textCol))
    val nb = greatest(ceil(size(toks) / lit(spanLen.toDouble)).cast("int"), lit(1))
    val blocks = sequence(lit(0), nb - 1)
    def masked(b: Column): Column =
      substring(md5(concat(lit(salt), col(idCol).cast("string"),
        lit("-"), b.cast("string"))), 1, 8) < lit(rateHex)
    def blockText(b: Column): Column =
      array_join(slice(toks, b * spanLen + 1, lit(spanLen)), " ")
    def sentinel(b: Column): Column =
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    val inputArr = transform(blocks,
      b => when(masked(b), sentinel(b)).otherwise(blockText(b)))
    val targetArr = filter(
      transform(blocks,
        b => when(masked(b), concat(sentinel(b), lit(" "), blockText(b)))),
      x => x.isNotNull)
    df.select(col(idCol),
      array_join(inputArr, " ").as("input_text"),
      array_join(targetArr, " ").as("target_text"),
      size(targetArr).cast("long").as("n_masked"),
      nb.cast("long").as("n_blocks"))
  }

  /** Preference-pair assembly (the DPO/RLHF reward-data shaping step):
    * from scored candidate responses, build one (chosen, rejected) pair
    * per prompt — the best- and worst-scored response, with
    * deterministic total tie-breaking by response id (larger id wins
    * the chosen side, smaller id the rejected side, so the pair is
    * stable across engines and reruns). Prompts whose best and worst
    * scores are EQUAL are dropped: a pair with zero margin carries no
    * preference signal, and emitting it would train on noise.
    *
    * Scale shape: ONE partially-aggregated shuffle on the prompt key —
    * chosen/rejected are `max`/`min` over (score, id, text) structs,
    * which combine map-side (each mapper sends at most one candidate
    * struct per prompt, not the full response list), so response text
    * crosses the wire once per (mapper, prompt), never as a collected
    * group. No window, no sort.
    */
  def preferencePairs(
      responses: DataFrame, promptCol: String, idCol: String,
      textCol: String, scoreCol: String): DataFrame = {
    val cand = struct(col(scoreCol).as("score"), col(idCol).as("id"),
      col(textCol).as("text"))
    responses
      // an unscored response can neither win nor lose; keeping it would
      // make struct min/max ordering depend on engine null placement
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(cand).as("__top"),
        min(cand).as("__bot"))
      .filter(col("__top")("score") > col("__bot")("score"))
      .select(
        col("prompt_id"),
        col("n_candidates"),
        col("__top")("id").as("chosen_id"),
        col("__top")("text").as("chosen"),
        col("__top")("score").as("chosen_score"),
        col("__bot")("id").as("rejected_id"),
        col("__bot")("text").as("rejected"),
        col("__bot")("score").as("rejected_score"))
  }

  /** Sliding context→target training examples from event sequences —
    * the example generator for next-item / next-action models: per
    * entity, each event becomes a target with the `contextLen`
    * immediately-preceding item labels as its context. Only FULL
    * windows emit (an entity's first `contextLen` events are context
    * for later examples, never under-filled targets), so every example
    * has a fixed shape for the trainer.
    *
    * Scale shape: one keyed shuffle on the entity, one partitioned
    * window sort — the standard sessionize plan; the context is
    * assembled by `collect_list` over a bounded ROWS frame (at most
    * `contextLen` labels buffered per row, never the whole history).
    * Event order is made total with the id tie-break so both engines
    * assemble identical contexts. Context is emitted space-joined
    * (fixed-shape string) rather than as an array column.
    */
  def nextEventExamples(
      events: DataFrame, entityCol: String, timeCol: String,
      idCol: String, labelCol: String, contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val w = Window.partitionBy(col("entity_id"))
      .orderBy(col("__t"), col("target_id"))
      .rowsBetween(-contextLen, -1)
    events
      .select(col(entityCol).as("entity_id"), col(timeCol).as("__t"),
        col(idCol).as("target_id"), col(labelCol).as("target"))
      .withColumn("__ctx", collect_list(col("target")).over(w))
      .filter(size(col("__ctx")) === contextLen)
      .select(col("entity_id"), col("target_id"),
        array_join(col("__ctx"), " ").as("context"), col("target"))
  }
}
