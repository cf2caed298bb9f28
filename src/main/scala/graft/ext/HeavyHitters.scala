package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters: the bounded-memory frequent-items
  * summary (Misra & Gries 1982; mergeable form Agarwal et al.,
  * PODS'12). A k-entry summary over a stream of N items guarantees:
  *
  *   - every item with true count > N/k IS in the summary
  *     (no false negatives above the threshold);
  *   - each estimate is an undercount by at most N/k:
  *     true − N/k ≤ est ≤ true.
  *
  * Why this exists next to the exact `groupBy(count)`: the exact path
  * shuffles one row per distinct item — fine for domains, catastrophic
  * for open vocabularies at 100 TB when only the head matters. The MG
  * summary is a CONSTANT-SIZE mergeable buffer, so the whole
  * aggregation is one partial-agg shuffle of k-entry maps (and the
  * same object drops into `mapGroupsWithState` for streaming top-k).
  *
  * Determinism note: which NON-heavy items survive in the summary
  * depends on merge order, so gates must only assert the
  * order-independent guarantees above — presence and bounds for items
  * over the threshold — never the summary's full content.
  */
object HeavyHitters {

  /** The mergeable MG aggregator: input item → k-entry count map. */
  case class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"summary size must be >= 2, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (b.contains(a)) b.updated(a, b(a) + 1L)
      else if (b.size < k - 1) b.updated(a, 1L)
      else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap

    /** Mergeable form: sum counts, then if over capacity subtract the
      * k-th largest count from everything and drop the non-positive —
      * the PODS'12 result that makes MG a distributed aggregate.
      */
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k - 1) sum
      else {
        val kth = sum.values.toSeq.sorted(Ordering.Long.reverse)(k - 1)
        sum.view.mapValues(_ - kth).filter(_._2 > 0L).toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    // Native map encoders on BOTH sides: the buffer crosses the partial
    // aggregate as a plain MapType row, not an opaque kryo blob —
    // faster, and immune to JDK-17 module-opens reflection surprises.
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Gate-shaped contract check over a token column: for every item
    * whose EXACT count exceeds N/k, report presence in the MG summary
    * and whether the estimate respects the undercount bound. Output is
    * order-independent (heavy items only), so it is oracle-pinnable
    * even though the summary's tail content is not.
    */
  def heavyHitterContract(df: DataFrame, tokenCol: String, k: Int): DataFrame = {
    val mg = udaf(MisraGries(k))
    val summary = df.agg(mg(col(tokenCol)).as("summary"))
    val exact = df.groupBy(col(tokenCol).as("item"))
      .agg(count(lit(1)).as("exact_n"))
    val total = df.agg(count(lit(1)).as("n_total"))
    exact
      .crossJoin(broadcast(total))
      .filter(col("exact_n") * k > col("n_total")) // exact > N/k
      .crossJoin(broadcast(summary))
      .select(
        col("item"), col("exact_n"),
        // 0/1 BIGINT per the safe-alphabet law (raw BOOLEANs are
        // hash-render hazards at the driver compare)
        col("summary").getItem(col("item")).isNotNull
          .cast("long").as("present"),
        (coalesce(col("summary").getItem(col("item")), lit(0L)).cast("double")
          .between(
            col("exact_n").cast("double") - col("n_total").cast("double") / k,
            col("exact_n").cast("double")))
          .cast("long").as("within_bound"))
  }
}
