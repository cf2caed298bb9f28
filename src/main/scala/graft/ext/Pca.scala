package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the whitening / dimensionality-
  * reduction step a corpus pipeline runs before ANN indexing or
  * clustering. Split the way the arithmetic wants to be split:
  *
  *  - the DISTRIBUTED part is the covariance matrix: one double-
  *    posexplode pass + a (i, j)-keyed `covar_pop` aggregate — a
  *    single-pass co-moment partial aggregate whose shuffle carries
  *    dim² groups, never documents. Oracle-gated cell by cell
  *    (`q_ext_covariance`).
  *  - the DRIVER part is the eigensolve over the collected dim×dim
  *    matrix (bytes-small for embedding dims): deterministic power
  *    iteration with deflation. Spec-pinned against closed-form 2-D
  *    fixtures; its CONTRACT (orthonormality, eigen residual, sorted
  *    nonnegative eigenvalues, projected variance == eigenvalue) is
  *    driver-gated as booleans (`q_ext_pca_contract`).
  *  - projection back over the corpus is a broadcast of k unit vectors
  *    into a codegen'd dot product per row.
  *
  * Scale note: the explode spelling costs ndocs×dim² generated rows of
  * CPU (fine to dim ≈ 128; partial aggregation keeps the shuffle at
  * dim² regardless). For wider vectors the same aggregate belongs in a
  * typed Gram-matrix accumulator (the [[graft.functions.SketchAggregates]]
  * pattern) — identical output, one buffer per partition.
  */
object Pca {

  /** Population covariance matrix in long format (i, j, cov), i/j
    * 0-based dims, `cov` rounded to `scale` for engine-stable output.
    *
    * Engine-exactness WITHOUT the decimal tax: a direct `covar_pop`
    * over doubles is order-dependent — cross-partition accumulation
    * order lands cells on either side of the rounding boundary run to
    * run. Decimal sufficient statistics fix that but cost ~50× (three
    * BigDecimal aggregates over ndocs·dim² generated rows — measured,
    * 0.65 s → 31 s at sf0.1). Instead each statistic is quantized to
    * SPLIT FIXED-POINT: the per-row term is rounded at 1e-15 to an
    * integer (one deterministic IEEE op; |p| < 2^49 for unit-scale
    * embeddings), split into 24-bit halves hi = ⌊p/2^24⌋, lo = p −
    * hi·2^24 (the /2^24 is a power-of-two scaling, exact in double),
    * and both halves sum as plain codegen'd longs — exact,
    * order-independent, overflow-safe past 10^11 rows (hi, lo ≤ 2^25
    * per row). The reconstruction hi·2^24 + lo and the final
    * division/subtraction are a fixed chain of IEEE double ops, so any
    * engine computing the same algebra reproduces the value
    * bit-for-bit; the 1e-15 quantization is itself part of the
    * operator's contract (5e-16 absolute error — three orders below
    * the 6-dp output rounding).
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, scale: Int = 6): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    import FixedPoint.{fx, hi, lo, rebuild}
    df.select(posexplode(v).as(Seq("i", "vi")), v.as("__v"))
      .select(col("i"), col("vi"), posexplode(col("__v")).as(Seq("j", "vj")))
      // quantize each statistic ONCE in the projection; the aggregate
      // below is pure long shifts and sums (all codegen fast paths)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        fx(col("vi") * col("vj")).as("__pij"),
        fx(col("vi")).as("__pi"),
        fx(col("vj")).as("__pj"))
      .groupBy(col("i"), col("j"))
      .agg(
        sum(hi(col("__pij"))).as("__hij"),
        sum(lo(col("__pij"))).as("__lij"),
        sum(hi(col("__pi"))).as("__hi"),
        sum(lo(col("__pi"))).as("__li"),
        sum(hi(col("__pj"))).as("__hj"),
        sum(lo(col("__pj"))).as("__lj"),
        count(lit(1)).as("__n"))
      .select(col("i"), col("j"),
        // + 0.0 normalizes IEEE signed zero: a hash-level compare must
        // never see -0.0 vs 0.0 on a value-equal cell (the oracle side
        // normalizes identically)
        (round(
          rebuild(col("__hij"), col("__lij")) / col("__n")
            - (rebuild(col("__hi"), col("__li")) / col("__n"))
            * (rebuild(col("__hj"), col("__lj")) / col("__n")),
          scale) + lit(0.0)).as("cov"))
  }

  /** Top-`k` principal components of a symmetric matrix via
    * deterministic power iteration, re-orthogonalized against the
    * already-found components EVERY step (sequential orthogonal
    * iteration — orthonormality then holds to machine precision by
    * construction, independent of the eigengap; a deflation-based
    * variant would inherit the previous component's convergence
    * error). Returns (eigenvalue, unit eigenvector) pairs with
    * λ = qᵀMq, descending up to iteration tolerance. Driver-side by
    * design — `cov` is dim×dim, collected from [[covarianceMatrix]]'s
    * long format.
    */
  def topComponents(cov: Array[Array[Double]], k: Int,
      iterations: Int = 300): Seq[(Double, Array[Double])] = {
    val dim = cov.length
    require(cov.forall(_.length == dim), "covariance matrix must be square")
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    def matVec(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += cov(i)(j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      y
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    val found = scala.collection.mutable.ArrayBuffer.empty[(Double, Array[Double])]
    def orthonormalize(v: Array[Double]): Array[Double] = {
      var y = v
      found.foreach { case (_, q) =>
        val p = dot(q, y)
        y = y.zip(q).map { case (yi, qi) => yi - p * qi }
      }
      val n = math.sqrt(dot(y, y))
      if (n > 1e-300) y.map(_ / n) else y
    }
    (0 until k).foreach { c =>
      // deterministic start: ones + e_c + index skew — mutually
      // independent for every c (differences are basis vectors), not
      // orthogonal to a generic dominant eigenvector, and
      // orthonormalized up front so a (sub)space where M acts as zero
      // (e.g. a constant-embedding corpus) still yields a unit vector
      // orthogonal to everything already found
      var x = orthonormalize(Array.tabulate(dim)(i =>
        1.0 + (if (i == c % dim) 1.0 else 0.0) + i.toDouble / (dim * (dim + 1))))
      (0 until iterations).foreach { _ =>
        val y = orthonormalize(matVec(x))
        if (math.sqrt(dot(y, y)) > 0.5) x = y // zero matVec: keep x
      }
      // fix sign for determinism: FIRST entry within an epsilon of the
      // largest magnitude becomes positive (a bare argmax is unstable
      // when two entries tie up to float error — e.g. the ±1/√2
      // eigenvectors of a 2-D symmetric matrix)
      val maxAbs = x.map(math.abs).max
      val pivot = x.indices.find(i => math.abs(x(i)) >= maxAbs - 1e-9).get
      if (x(pivot) < 0) x = x.map(-_)
      found += ((dot(x, matVec(x)), x))
    }
    found.toSeq
  }

  /** Collect a [[covarianceMatrix]] frame into the dense symmetric
    * matrix `topComponents` consumes. */
  def collectMatrix(cov: DataFrame): Array[Array[Double]] = {
    val cells = cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect()
    val dim = cells.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    m
  }

  /** Project the embedding column onto `components` (broadcast as plan
    * literals): output `array<double>` of length k, one codegen'd dot
    * product per component per row.
    */
  def project(df: DataFrame, vecCol: String, components: Seq[Array[Double]],
      scale: Int = 6): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val dots: Seq[Column] = components.map { comp =>
      val terms = comp.zipWithIndex.map { case (w, d) =>
        element_at(v, d + 1) * lit(w) }
      round(terms.reduce(_ + _), scale)
    }
    df.withColumn("projected", array(dots: _*))
  }
}
