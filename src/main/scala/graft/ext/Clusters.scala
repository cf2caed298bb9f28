package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detectors ([[Dedup]]) emit
  * PAIRS; keeping one canonical document per duplicate group needs the
  * transitive closure — connected components over the pair graph, with
  * each component labeled by its smallest member (the natural canonical
  * choice: stable, order-free).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum of its
  * own and its neighbors' labels; fixpoint = components. Rounds needed
  * = graph diameter, and near-dup graphs are short-diameter (dup
  * groups are near-cliques), so the default iteration cap is generous.
  *
  * Scale shape: each round is one broadcast-or-shuffle join
  * (edges × labels) + one groupBy min — all data-parallel. The driver
  * holds only the convergence counter (a scalar aggregate) and the
  * loop; per-round `localCheckpoint` truncates the growing lineage so
  * round N's plan does not replay rounds 1..N-1. This is the standard
  * Spark shape for bounded-iteration graph algorithms (label
  * propagation / large-star small-star families).
  */
object Clusters {

  /** Connected components of the undirected graph given by
    * (`srcCol`, `dstCol`) edges. Output: (`node`, `cluster`) for every
    * node that appears in an edge; `cluster` = min node id reachable.
    *
    * @throws IllegalStateException if labels have not converged after
    *         `maxIterations` rounds (diameter larger than the cap) —
    *         fail loudly rather than return a partial closure.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIterations: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var round = 0
    while (round < maxIterations) {
      val nbrMin = sym
        .join(labels.select(col("node").as("b"), col("label").as("bl")), "b")
        .groupBy(col("a").as("node2"))
        .agg(min(col("bl")).as("nl"))
      val next = labels
        .join(nbrMin, labels("node") === nbrMin("node2"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("next_label"))
        .localCheckpoint(true)
      val converged = next.filter(col("next_label") =!= col("label")).isEmpty
      labels = next.select(col("node"), col("next_label").as("label"))
      round += 1
      if (converged) return labels.withColumnRenamed("label", "cluster")
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations rounds")
  }
}
