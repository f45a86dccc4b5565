package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar quantization (SQ8) for embedding columns: per-dimension min/max
  * bounds → 8-bit codes, the standard 4× memory compression in front of
  * ANN search (the IVF/LSH operators consume either representation).
  *
  * Scale shape: the bounds pass is ONE aggregation producing 2×dim scalars
  * (collected driver-side — bounded by dimension, not rows); encode and
  * decode are pure projections with the bounds inlined as literals, so both
  * stream with zero shuffle and stay in codegen. All arithmetic is IEEE
  * double written identically in the oracle SQL — codes are engine-exact.
  */
object Quantize {

  final case class Sq8Bounds(mins: Seq[Double], maxs: Seq[Double])

  /** One agg over the vector column: per-dimension min/max. */
  def sq8Bounds(df: DataFrame, vecCol: String, dim: Int): Sq8Bounds = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val aggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(v, d + 1)).as(s"mn_$d"),
        max(element_at(v, d + 1)).as(s"mx_$d"))
    }
    val row = df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .agg(aggs.head, aggs.tail: _*).head()
    // zero matching rows → null aggregates; fail with the cause, not an NPE
    require(!row.isNullAt(0),
      s"no non-null $dim-dimensional vectors in $vecCol — cannot fit bounds")
    Sq8Bounds(
      (0 until dim).map(d => row.getDouble(2 * d)),
      (0 until dim).map(d => row.getDouble(2 * d + 1)))
  }

  /** Quantize to codes in [0, 255]: floor((x - min) / (max - min) * 255),
    * clamped; degenerate dimensions (min == max) code to 0. Bounds ride as
    * literals — pure projection.
    */
  def sq8Encode(df: DataFrame, vecCol: String, bounds: Sq8Bounds,
                outCol: String = "codes"): DataFrame = {
    val dim = bounds.mins.length
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val codes = array((0 until dim).map { d =>
      val mn = bounds.mins(d); val mx = bounds.maxs(d)
      if (mx == mn) lit(0)
      else least(lit(255), greatest(lit(0),
        floor((element_at(v, d + 1) - lit(mn)) / lit(mx - mn) * 255.0)))
        .cast(IntegerType)
    }: _*)
    df.withColumn(outCol, codes)
  }

  /** Reconstruct approximate vectors from codes (code center points). */
  def sq8Decode(df: DataFrame, codesCol: String, bounds: Sq8Bounds,
                outCol: String = "approx"): DataFrame = {
    val dim = bounds.mins.length
    val approx = array((0 until dim).map { d =>
      val mn = bounds.mins(d); val mx = bounds.maxs(d)
      if (mx == mn) lit(mn)
      else (element_at(col(codesCol), d + 1).cast(DoubleType) + lit(0.5)) /
        lit(255.0) * lit(mx - mn) + lit(mn)
    }: _*)
    df.withColumn(outCol, approx)
  }

  // ------------------------------------------------------------------ PQ
  /** Product quantization (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", IEEE TPAMI 2011): the vector splits into `m`
    * subvectors, each coded as the id of its nearest per-subspace centroid —
    * dim×8 bytes compress to m codes. Codebooks train driver-side on ONE
    * bounded sample (same shape as IVF coarse training); encode/decode are
    * pure projections with the codebooks inlined as array literals, so both
    * stream with zero shuffle. [[graft.ops.Similarity.ivfSearchPq]] pairs
    * this with the IVF index — the standard IVF-PQ layout at 100 TB, where
    * the index stores (cluster, codes) and never the raw vectors.
    */
  final case class PqBooks(subDim: Int, books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def k: Int = books.head.length
    def dim: Int = m * subDim
    /** books as a nested literal column (m × k × subDim). */
    private[ops] def lit3: Column =
      typedlit(books.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)
  }

  /** Train per-subspace codebooks on a bounded driver-side sample — one
    * sample collect, `m` local Lloyd runs (seed varies per subspace).
    */
  def trainPq(df: DataFrame, vecCol: String, dim: Int, m: Int = 8,
              k: Int = 16, sampleSize: Int = 2000, iters: Int = 10,
              seed: Long = 42L): PqBooks = {
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val subDim = dim / m
    val full = Similarity.sampleVectors(
      df.where(col(vecCol).isNotNull && size(col(vecCol)) === dim),
      vecCol, sampleSize, seed)
    require(full.nonEmpty, "empty sample for PQ training")
    PqBooks(subDim, Array.tabulate(m) { i =>
      val sub = full.map(_.slice(i * subDim, (i + 1) * subDim))
      Similarity.kmeansLocal(sub, k, iters, seed + i)
    })
  }

  /** Code array expression: for each subspace, the id of the nearest
    * centroid. Uses the native codegen'd
    * [[graft.expressions.PqEncode]] (fused m·k·subDim loop, ~µs/row) when
    * [[graft.GraftExtensions]] is installed; the composable fallback
    * (per-subspace array_sort over k distance structs by the
    * ‖c‖² − 2·v·c proxy — same argmin) is an interpreted HOF tree three
    * orders of magnitude slower, kept only for extension-less sessions.
    */
  def pqEncodeExpr(vecCol: Column, pq: PqBooks): Column = {
    val native =
      try org.apache.spark.sql.SparkSession.active.catalog
        .functionExists("ww_pq_encode")
      catch { case _: Throwable => false }
    if (native) call_function("ww_pq_encode", vecCol, pq.lit3)
    else {
      val v = transform(vecCol, x => x.cast(DoubleType))
      array((0 until pq.m).map { i =>
        val cands = array(pq.books(i).zipWithIndex.map { case (c, j) =>
          val cc = c.map(x => x * x).sum
          val dotc = (0 until pq.subDim).map(d =>
            element_at(v, i * pq.subDim + d + 1) * lit(c(d))).reduce(_ + _)
          struct((lit(cc) - dotc * 2).as("d"), lit(j).as("c"))
        }: _*)
        element_at(array_sort(cands), 1).getField("c")
      }: _*)
    }
  }

  def pqEncode(df: DataFrame, vecCol: String, pq: PqBooks,
               outCol: String = "codes"): DataFrame =
    df.withColumn(outCol, pqEncodeExpr(col(vecCol), pq))

  /** Reconstruct the approximate vector: per subspace, the coded centroid,
    * concatenated — an indexed lookup into the codebook literal.
    */
  def pqDecodeExpr(codesCol: Column, pq: PqBooks): Column =
    flatten(zip_with(codesCol, sequence(lit(0), lit(pq.m - 1)),
      (c, i) => element_at(element_at(pq.lit3, i + 1), c + 1)))

  def pqDecode(df: DataFrame, codesCol: String, pq: PqBooks,
               outCol: String = "approx"): DataFrame =
    df.withColumn(outCol, pqDecodeExpr(col(codesCol), pq))

  /** Per-vector PQ reconstruction error (mean/max absolute error) — the
    * quality check mirroring [[sq8Error]].
    */
  def pqError(df: DataFrame, vecCol: String, pq: PqBooks): DataFrame = {
    val enc = pqEncode(df.where(col(vecCol).isNotNull &&
      size(col(vecCol)) === pq.dim), vecCol, pq)
    val dec = pqDecode(enc, "codes", pq)
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val errs = zip_with(v, col("approx"), (a, b) => abs(a - b))
    dec
      .withColumn("mean_err", round(aggregate(errs, lit(0.0), _ + _) / pq.dim, 6))
      .withColumn("max_err", round(array_max(errs), 6))
  }

  // ---------------------------------------------------------------- OPQ

  /** OPQ rotation model (parametric variant — Ge et al., "Optimized
    * Product Quantization", CVPR 2013 §4): rotate into the PCA basis, then
    * deal the eigen-dimensions into the `m` subspaces by descending
    * eigenvalue with a capacity-constrained greedy (least-loaded bucket
    * with room), so every subspace carries ~equal variance. The BALANCE is
    * what cuts quantization error — naive PCA rotation alone concentrates
    * variance into the first subspace and can measure WORSE than raw PQ
    * (it does on the near-isotropic test embeddings); balancing beats raw
    * PQ on both isotropic and skewed spectra.
    *
    * `rotation` holds a [[Pca.PcaModel]] whose components are already
    * permuted to the balanced order, so `Pca.projectExpr` IS the rotation
    * expression — a literal-matrix codegen projection, zero shuffle, the
    * same shape as every other fit-then-project operator here. Rotation is
    * orthogonal, so reconstruction error measured in the rotated space
    * equals the error in the original space.
    */
  final case class OpqModel(rotation: Pca.PcaModel, pq: PqBooks) {
    /** The rotation as a column expression — compose it with any
      * vector operator (IVF assignment, encode, cosine search) to run
      * that operator in the rotated space.
      */
    def rotateExpr(vecCol: Column): Column = Pca.projectExpr(vecCol, rotation)
  }

  /** `centered = true` (default) subtracts the corpus mean before rotating
    * — the right space for RECONSTRUCTION (compression, dedup-by-error).
    * Pass `centered = false` for COSINE consumers (IVF/LSH search over the
    * rotated space): a pure rotation is orthogonal, so rotated cosine ==
    * original cosine exactly, while the mean shift of the centered variant
    * would change angles. The balanced eigen allocation is computed the
    * same way in both modes.
    */
  def trainOpq(df: DataFrame, vecCol: String, dim: Int, m: Int = 8,
               k: Int = 16, sampleSize: Int = 2000, iters: Int = 10,
               seed: Long = 42L, centered: Boolean = true): OpqModel = {
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val subDim = dim / m
    val pca0 = Pca.fit(df, vecCol, dim, dim)
    val pca = if (centered) pca0
      else Pca.PcaModel(new Array[Double](dim), pca0.components, pca0.variances)
    // capacity-constrained greedy: components arrive sorted by descending
    // eigenvalue; each lands in the least-loaded subspace that has room
    val load = new Array[Double](m)
    val filled = new Array[Int](m)
    val buckets = Array.fill(m)(List.newBuilder[Int])
    for (i <- 0 until dim) {
      val b = (0 until m).filter(filled(_) < subDim).minBy(load(_))
      buckets(b) += i; load(b) += pca.variances(i); filled(b) += 1
    }
    val perm = buckets.flatMap(_.result())
    val rot = Pca.PcaModel(pca.mean, perm.map(pca.components),
      perm.map(pca.variances))
    val rotated = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .withColumn("__rot", Pca.projectExpr(col(vecCol), rot))
    OpqModel(rot, trainPq(rotated, "__rot", dim, m, k, sampleSize, iters, seed))
  }

  /** PQ codes of the rotated vector — rotation and encode compose into one
    * codegen projection (no intermediate column, no shuffle).
    */
  def opqEncode(df: DataFrame, vecCol: String, model: OpqModel,
                codesCol: String = "codes"): DataFrame =
    df.withColumn(codesCol,
      pqEncodeExpr(Pca.projectExpr(col(vecCol), model.rotation), model.pq))

  /** Per-vector OPQ reconstruction error, measured in the rotated space
    * (= original-space error; the rotation is orthogonal).
    */
  def opqError(df: DataFrame, vecCol: String, model: OpqModel): DataFrame =
    pqError(
      df.where(col(vecCol).isNotNull &&
          size(col(vecCol)) === model.rotation.mean.length)
        .withColumn("__rot", Pca.projectExpr(col(vecCol), model.rotation)),
      "__rot", model.pq)

  /** Per-vector reconstruction error of the quantization (mean/max absolute
    * error against the original) — the quality check after compression.
    */
  def sq8Error(df: DataFrame, vecCol: String, bounds: Sq8Bounds): DataFrame = {
    val dim = bounds.mins.length
    val enc = sq8Encode(df.where(col(vecCol).isNotNull &&
      size(col(vecCol)) === dim), vecCol, bounds)
    val dec = sq8Decode(enc, "codes", bounds)
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val errs = zip_with(v, col("approx"), (a, b) => abs(a - b))
    dec
      .withColumn("mean_err", round(aggregate(errs, lit(0.0), _ + _) / dim, 6))
      .withColumn("max_err", round(array_max(errs), 6))
  }
}
