package graft.ext

import java.util.Arrays

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** K-minimum-values (KMV / bottom-k) distinct sketch — the set-algebra
  * sketch HLL cannot be (Bar-Yossef et al. RANDOM'02; Beyer et al.
  * SIGMOD'07). An HLL union is register-max, but there is no HLL
  * INTERSECTION; a KMV sketch (the k smallest hash values of the set)
  * supports:
  *
  *   - distinct estimate:  D̂ = (k−1) / u_(k)  with u_(k) the k-th
  *     smallest hash normalized to [0,1);
  *   - EXACT mergeability: the k smallest of A ∪ B are computable from
  *     the k smallest of A and of B alone — bottom-k(merge) ≡
  *     bottom-k(direct) as a set identity, not an approximation;
  *   - Jaccard/intersection: the union sketch is a uniform k-sample of
  *     A ∪ B, so the fraction of its values present in both sides
  *     estimates J(A, B), and |A ∩ B| ≈ J · D̂(A ∪ B).
  *
  * That set algebra is what audience-overlap / corpus-contamination
  * questions need at 100 TB: per-shard bottom-k sketches are one
  * constant-size partial-agg row each, stores union without rescans,
  * and cross-corpus overlap comes from two stored sketches instead of
  * a distinct-join over everything.
  *
  * Gate design: sketch VALUES are xxhash64-specific, so the gates
  * hash-check the exact distinct/intersection counts both engines
  * compute and pin (a) the exact merge identity and (b) the estimator
  * accuracy as oracle-asserted booleans — the q_ext_minhash_est
  * pattern.
  */
object Kmv {

  /** Typed aggregator: keeps the `k` smallest DISTINCT sign-shifted
    * hash values in a sorted array. The buffer crosses the partial
    * aggregate as a plain array row (native encoder, no kryo blob);
    * insertion is binary-search + bounded arraycopy, O(log k + k) per
    * NEW minimum — once the buffer saturates, values above the k-th
    * minimum short-circuit at the first comparison.
    */
  case class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 16, s"KMV needs a reasonable k (>= 16), got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
      val v = hash ^ Long.MinValue // unsigned order as signed longs
      insert(buf, v)
    }

    private def insert(buf: Array[Long], v: Long): Array[Long] = {
      if (buf.length == k && v >= buf(k - 1)) return buf
      val pos = Arrays.binarySearch(buf, v)
      if (pos >= 0) return buf // already present: DISTINCT sketch
      val ins = -pos - 1
      val outLen = math.min(buf.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
      out
    }

    /** Bottom-k of the concatenation — the exact merge identity. */
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var out = x
      var i = 0
      while (i < y.length) { out = insert(out, y(i)); i += 1 }
      out
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Distinct estimate from a sketch (shifted values): exact while the
    * buffer is unsaturated (it IS the distinct hash set), (k−1)/u_(k)
    * once full.
    */
  def estimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else {
      val kth = sketch(k - 1).toDouble - Long.MinValue.toDouble // back to [0, 2^64)
      (k - 1).toDouble / (kth / math.pow(2.0, 64))
    }

  /** Exact bottom-k merge of two finished sketches. */
  def mergeSketches(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val all = (a ++ b).distinct.sorted
    all.take(k)
  }

  /** Jaccard estimate: share of the union sketch present in BOTH input
    * sketches (each a superset-filter for membership of its own side).
    */
  def jaccardEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val u = mergeSketches(a, b, k)
    if (u.isEmpty) 0.0
    else {
      val sa = a.toSet
      val sb = b.toSet
      u.count(v => sa.contains(v) && sb.contains(v)).toDouble / u.length
    }
  }

  /** The full set-algebra contract over two sides of `valueCol` split
    * by `sideCol` parity: exact distinct |A|, |B|, |A ∩ B|, |A ∪ B|
    * (hash-checkable by any engine) + the KMV merge identity and
    * estimator accuracy booleans. The two sketches are built
    * DISTRIBUTED (one constant-size row each crosses the wire); only
    * the two k-long finished sketches reach the driver — the
    * PCA-eigensolve-class bounded exception.
    */
  def setAlgebraContract(df: DataFrame, valueCol: String, sideCol: String,
      k: Int = 1024, relTol: Double = 0.1): DataFrame = {
    val spark = df.sparkSession
    val agg = udaf(KmvAgg(k))
    val hashed = df.select(xxhash64(col(valueCol)).as("h"),
      (col(sideCol) % 2 === 0).as("even"))
    val sketches = hashed.groupBy(col("even")).agg(agg(col("h")).as("sk"))
      .collect().map(r => r.getBoolean(0) -> r.getSeq[Long](1).toArray).toMap
    val a = sketches.getOrElse(true, Array.emptyLongArray)
    val b = sketches.getOrElse(false, Array.emptyLongArray)
    // Exact side: both engines can compute these.
    val sides = df.select(col(valueCol).as("v"),
      (col(sideCol) % 2 === 0).as("even")).distinct()
    val ex = sides.groupBy(col("v"))
      .agg(max(when(col("even"), lit(1)).otherwise(0)).as("in_a"),
        max(when(!col("even"), lit(1)).otherwise(0)).as("in_b"))
      .agg(
        sum(col("in_a")).cast("long").as("n_a"),
        sum(col("in_b")).cast("long").as("n_b"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_inter"),
        count(lit(1)).as("n_union"))
      .head()
    val (nA, nB, nInter, nUnion) =
      (ex.getLong(0), ex.getLong(1), ex.getLong(2), ex.getLong(3))
    // Sketch side: merge identity + estimates, all on <= 2k longs.
    val direct = {
      val aggAll = hashed.select(col("h")).agg(agg(col("h")).as("sk"))
      aggAll.head().getSeq[Long](0).toArray
    }
    val merged = mergeSketches(a, b, k)
    val estU = estimate(merged, k)
    val estInter = jaccardEstimate(a, b, k) * estU
    val tolU = math.max(relTol * nUnion, 4.0)
    val tolI = math.max(relTol * nUnion, 4.0) // intersection error scales with union
    // 0/1 BIGINT flags per the safe-alphabet law (raw BOOLEANs are
    // hash-render hazards at the driver compare)
    val row = Row(nA, nB, nInter, nUnion,
      if (Arrays.equals(merged, direct)) 1L else 0L,
      if (math.abs(estU - nUnion) <= tolU) 1L else 0L,
      if (math.abs(estInter - nInter) <= tolI) 1L else 0L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1),
      StructType(Seq(
        StructField("n_a", LongType), StructField("n_b", LongType),
        StructField("n_inter", LongType), StructField("n_union", LongType),
        StructField("merge_eq_direct", LongType),
        StructField("union_est_ok", LongType),
        StructField("inter_est_ok", LongType))))
  }
}
