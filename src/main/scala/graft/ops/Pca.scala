package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the whitening / dimensionality
  * reduction step ahead of an ANN index (the OPQ-style rotation that makes
  * product quantization and LSH buckets treat every direction equally; see
  * Ge et al., "Optimized Product Quantization", CVPR 2013).
  *
  * Scale shape (the Spark MLlib `RowMatrix.computeCovariance` pattern):
  * ONE pass over the data accumulates per-partition moment partials — row
  * count, per-dimension sum, and the upper triangle of the Gram matrix
  * (d(d+1)/2 doubles, 2 080 for d=64) — combined with `treeAggregate`, so
  * the driver never sees more than a handful of partial vectors no matter
  * how many partitions the 100 TB scan has. The d×d eigenproblem is then
  * driver-side (cyclic Jacobi — d is the EMBEDDING dimension, bounded and
  * tiny next to the corpus), and the projection back over the data is a
  * pure codegen expression with the components baked in as literals, the
  * same literal-matrix shape as k-means assignment and PQ encoding.
  *
  * Eigenvector sign is fixed by convention (largest-|coefficient| entry
  * made positive) so fits are reproducible across runs and engines.
  */
object Pca {

  /** Fitted model: `mean(d)`, row-major `components(k)(d)` sorted by
    * descending eigenvalue, and the eigenvalues (variances) themselves.
    */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            variances: Array[Double])

  /** One-pass moments + driver eigen. Rows that are null or not exactly
    * `dim` long are skipped (the ragged-row convention of centroidNorms).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k must be in [1, $dim]")
    val tri = dim * (dim + 1) / 2
    val rows = df.select(Similarity.asDouble(col(vecCol)))
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .rdd.map(_.getSeq[Double](0).toArray)
    val zero = (0L, new Array[Double](dim), new Array[Double](tri))
    val (n, sum, gram) = rows.treeAggregate(zero)(
      seqOp = { case ((n, s, g), v) =>
        var i = 0; var t = 0
        while (i < dim) {
          s(i) += v(i)
          var j = i
          while (j < dim) { g(t) += v(i) * v(j); t += 1; j += 1 }
          i += 1
        }
        (n + 1, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < dim) { s1(i) += s2(i); i += 1 }
        var t = 0
        while (t < tri) { g1(t) += g2(t); t += 1 }
        (n1 + n2, s1, g1)
      })
    require(n > 1, s"PCA needs at least 2 rows of dimension $dim, got $n")
    val mean = sum.map(_ / n)
    // covariance = E[xxᵀ] − mean·meanᵀ  (population, like numpy.cov bias=1)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = symEig(cov)
    val order = values.indices.sortBy(ix => -values(ix)).take(k)
    val comps = order.map { ix =>
      val v = Array.tabulate(dim)(r => vectors(r)(ix))
      // sign convention: the largest-|coefficient| entry is positive
      val m = v.indices.maxBy(a => (math.abs(v(a)), -a))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray)
  }

  /** Projection of `vecCol` onto the fitted components as a pure expression:
    * `pc_j = Σ_i v[i]·w_j[i] − ⟨mean, w_j⟩` — one [[Similarity.dot]] against
    * a literal plane per component plus a literal offset, so the whole
    * projection stays inside whole-stage codegen (native `ww_vector_dot`
    * when the extension is installed). With `whiten`, each component is
    * additionally divided by its standard deviation `sqrt(variance)`.
    */
  def projectExpr(vecCol: Column, model: PcaModel,
                  whiten: Boolean = false): Column = {
    val pcs = model.components.indices.map { j =>
      val w = model.components(j)
      val offset = w.indices.map(i => w(i) * model.mean(i)).sum
      val raw = Similarity.dot(Similarity.asDouble(vecCol), lit(w)) - lit(offset)
      if (whiten) raw / lit(math.sqrt(model.variances(j) max 1e-300)) else raw
    }
    array(pcs: _*)
  }

  /** `df` with a `pcCol` array column of the k projected (optionally
    * whitened) coordinates.
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
              pcCol: String = "pc", whiten: Boolean = false): DataFrame =
    df.withColumn(pcCol, projectExpr(col(vecCol), model, whiten))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5): rotations zero each off-diagonal pair until convergence.
    * Returns (eigenvalues, eigenvectors-as-COLUMNS). O(d³) per sweep —
    * driver-side only, for the bounded embedding dimension.
    */
  private[graft] def symEig(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val tTan = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var i = 0
            while (i < n) { // columns p and q of M (and of V)
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
            var jj = 0
            while (jj < n) { // rows p and q of M
              val mpj = m(p)(jj); val mqj = m(q)(jj)
              m(p)(jj) = c * mpj - s * mqj
              m(q)(jj) = s * mpj + c * mqj
              jj += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => m(i)(i)), v)
  }
}
