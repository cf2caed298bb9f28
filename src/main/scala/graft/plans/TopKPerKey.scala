package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan (SURVEY §7 preference order (c)): top-k
  * rows per key with a dense 1..k rank — the semantics of
  * {{{ row_number() OVER (PARTITION BY keys ORDER BY order) <= k }}}
  * — executed as a two-phase bounded-heap aggregation instead of a
  * window.
  *
  * Why the window spelling is the 100 TB bottleneck: `Window` requires
  * every (key, row) to shuffle, then sorts each key's COMPLETE row set
  * just to keep k of them. For ANN ranking the pre-window row set is
  * |candidates| (millions per query); the kept set is k (3–5).
  * [[PartialTopKPerKeyExec]] runs a bounded heap per key inside each
  * map partition, so at most `k × keys-per-partition` rows ever reach
  * the exchange — the shuffle shrinks from O(candidates) to
  * O(k × keys), and no full sort happens anywhere (heap insertion is
  * log k on bounded size).
  *
  * Correctness of the partial phase: the global top-k of a key is a
  * subset of the union of per-partition top-k's — exactly the partial
  * aggregation argument for `max`, lifted to k elements.
  *
  * The rank is only well-defined when `order` is a total order of each
  * key's rows (same caveat as `row_number`, which is nondeterministic
  * otherwise — every engine query breaks ties on a unique id).
  *
  * Users never build this node by hand: [[graft.functions.RewriteWindowTopK]]
  * recognizes the declarative window spelling and swaps this in, the
  * Catalyst-native route (make the obvious spelling fast, don't grow a
  * custom API).
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is minted here, not consumed from the child — without this
  // the node has a nonempty missingInput and renders as invalid ('!')
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Shared bounded-heap machinery for the two phases. */
private[plans] object TopKHeaps {

  /** Keys held in one partial-phase map before it flushes downstream.
    * Flushing early is CORRECT for the partial phase — its survivors
    * are re-reduced by the final phase, so an early flush only costs
    * some map-side dedup — and it bounds memory at ~k × this many rows
    * where the old spilling Window had an external sorter. High-
    * cardinality keys (near-unique per partition) degrade to a pass-
    * through instead of an OOM.
    */
  val PartialFlushKeys = 1 << 17

  /** Per-partition reduction: at most `k` rows per key survive per
    * flush, ordered ascending by `ordering` (i.e. best-first for the
    * caller's descending sort). `maxKeys = None` (final phase) holds
    * every key until input end — required there, since groups must be
    * complete; memory is then O(k × keys-in-partition), the same order
    * as the operator's output.
    */
  def reduce(
      iter: Iterator[InternalRow],
      k: Int,
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      maxKeys: Option[Int] = None): Iterator[(UnsafeRow, Array[InternalRow])] = {
    // worst row first, so the head is the eviction candidate
    val heapOrd = ordering.reverse

    new Iterator[(UnsafeRow, Array[InternalRow])] {
      private var heaps =
        new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      private var drain: java.util.Iterator[
        java.util.Map.Entry[UnsafeRow, java.util.PriorityQueue[InternalRow]]] = _

      private def fill(): Unit = {
        while (iter.hasNext &&
            !(maxKeys.exists(heaps.size >= _))) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](k.min(16), heapOrd)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < k) heap.add(row.copy())
          else if (ordering.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
        }
        drain = heaps.entrySet().iterator()
      }
      fill()

      override def hasNext: Boolean = {
        if (drain.hasNext) true
        else if (iter.hasNext) { // flushed early: start a fresh map
          heaps = new java.util.LinkedHashMap()
          fill()
          drain.hasNext
        } else false
      }

      override def next(): (UnsafeRow, Array[InternalRow]) = {
        if (!hasNext) throw new NoSuchElementException
        val e = drain.next()
        val arr = e.getValue.toArray(new Array[InternalRow](e.getValue.size))
        java.util.Arrays.sort(arr, ordering)
        (e.getKey, arr)
      }
    }
  }
}

/** Map-side phase: no distribution requirement; emits the surviving
  * rows (≤ k per key per partition) with the child's schema untouched.
  */
case class PartialTopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      TopKHeaps.reduce(iter, kLocal, keyProj, ordering,
        maxKeys = Some(TopKHeaps.PartialFlushKeys)).flatMap(_._2)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the keys (EnsureRequirements
  * inserts the hash exchange over the partial phase's ≤ k×keys rows);
  * re-reduces each key's surviving rows and emits them with the dense
  * 1..k rank appended.
  */
case class FinalTopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  // no keys = global top-k: every partial survivor must meet in one
  // place (ClusteredDistribution(Nil) is rejected by Spark)
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) AllTuples else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      // rank appended via a JoinedRow, then flattened to UnsafeRow so
      // downstream operators get the layout they expect
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      TopKHeaps.reduce(iter, kLocal, keyProj, ordering).flatMap { case (_, rows) =>
        rows.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, rankAttr, child) =>
      FinalTopKPerKeyExec(k, keys, order, rankAttr,
        PartialTopKPerKeyExec(k, keys, order, planLater(child))) :: Nil
    case _ => Nil
  }
}
