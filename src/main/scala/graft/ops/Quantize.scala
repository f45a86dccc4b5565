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
