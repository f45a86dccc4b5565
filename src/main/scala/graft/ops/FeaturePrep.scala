package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature preparation for model training: column scaling and categorical
  * encoding — the last hop between a curated corpus and a training run.
  *
  * Determinism contract: fit statistics use EXACT integer arithmetic on
  * fixed-point cents (sums of longs are order-independent; a double
  * mean/variance would depend on aggregation order), so fitted parameters
  * and transformed values hash-match across engines and partitionings.
  * The sum of squares accumulates in DecimalType(38,0) — a long sum of
  * c² wraps silently past 2⁶³, which a single ~$20M value (2e9 cents)
  * squared already approaches; decimal sums stay exact (and just as
  * order-independent) to 10³⁸. Variance uses the exact integer numerator
  * n·Σx² − (Σx)², converted to double only for the final division, so
  * no catastrophic cancellation ever happens in floating point.
  */
object FeaturePrep {

  /** Fitted scaling parameters for one column, in integer cents.
    * `sumSqCents` is exact (decimal-accumulated); the variance numerator
    * n·Σx² − (Σx)² is computed in exact integer arithmetic and rounded to
    * double once, at the end.
    */
  final case class ScaleFit(n: Long, sumCents: Long, sumSqCents: BigDecimal,
                            minCents: Long, maxCents: Long) {
    def meanCents: Double = sumCents.toDouble / n
    def varCents2: Double = {
      val num = sumSqCents * BigDecimal(n) - BigDecimal(sumCents).pow(2)
      num.toDouble / (n.toDouble * n.toDouble)
    }
    def stdCents: Double = math.sqrt(math.max(varCents2, 0.0))
  }

  /** One aggregation pass over non-null values. The squared term is summed
    * as Decimal(38,0): exact and order-independent like a long sum, but
    * immune to the silent 2⁶³ wrap a LongType sum of squares hits for
    * large-magnitude columns.
    */
  def fitScale(df: DataFrame, valueCol: String): ScaleFit = {
    val cents = round(col(valueCol) * 100).cast(LongType)
    val centsDec = cents.cast(DecimalType(19, 0))
    val r = df.where(col(valueCol).isNotNull)
      .select(cents.as("c"), (centsDec * centsDec).as("c2"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c2")).cast(DecimalType(38, 0)).as("ss"),
        min(col("c")).as("mn"), max(col("c")).as("mx"))
      .head()
    require(r.getLong(0) > 0, s"no non-null values in $valueCol")
    ScaleFit(r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)),
      r.getLong(3), r.getLong(4))
  }

  /** z-score standardization under a fit: (x − mean)/std, rounded to 4
    * places. Pure projection — the fit rides the plan as literals.
    * Constant columns (std = 0) map to 0.0, consistent with [[minMax]],
    * never NaN/Infinity.
    */
  def standardize(fit: ScaleFit)(c: Column): Column = {
    if (fit.stdCents == 0.0) return lit(0.0)
    val cents = round(c * 100).cast(LongType).cast(DoubleType)
    round((cents - lit(fit.meanCents)) / lit(fit.stdCents), 4)
  }

  /** Min-max scaling to [0, 1] under a fit, rounded to 4 places; constant
    * columns map to 0.
    */
  def minMax(fit: ScaleFit)(c: Column): Column = {
    val cents = round(c * 100).cast(LongType).cast(DoubleType)
    val span = (fit.maxCents - fit.minCents).toDouble
    if (span == 0.0) lit(0.0)
    else round((cents - lit(fit.minCents.toDouble)) / lit(span), 4)
  }

  /** Frequency label encoding: each category maps to its rank by
    * descending count (ties on ascending value) — 0 is the most frequent,
    * the stable ordinal encoding for GBDT-style training. One groupBy,
    * then a global rank over the distinct-value table via
    * [[graft.util.Ranks.globalRowNumber]]: a single-task window while the
    * vocabulary stays under `bound` (the intended `category`-tagged use),
    * switching to the range-partitioned prefix-offset path above it — so
    * a mistyped high-cardinality column degrades to a parallel sort, not
    * a one-task serialization. Join back is vocabulary-sized (AQE
    * broadcasts it).
    *
    * Output: input columns + `<col>_enc`.
    */
  def frequencyEncode(df: DataFrame, catCol: String,
                      bound: Long = graft.util.Ranks.SingleTaskBound): DataFrame = {
    val mapping = df.where(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("__cnt"))
    val ranked = graft.util.Ranks.globalRowNumber(mapping,
        Seq(col("__cnt").desc, col(catCol).asc), s"${catCol}_enc", bound)
      .drop("__cnt")
    df.join(ranked, Seq(catCol), "left")
  }

  /** Smoothed mean-target encoding: each category maps to
    * `(Σ target_cat + m·prior) / (n_cat + m)` with `prior` the global
    * target mean — the standard leakage-damped categorical encoder for
    * GBDT/linear training. Determinism: both sums are EXACT integer cents
    * (order-independent); the formula converts to double in one pinned
    * expression shape, so encodings hash-match across engines and
    * partitionings. The mapping table is vocabulary-sized (AQE broadcasts
    * it); unseen/null categories encode to the prior.
    *
    * Output: input columns + `<catCol>_tenc` (rounded to 4 places).
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   smoothing: Double = 20.0): DataFrame = {
    require(smoothing >= 0, s"need smoothing >= 0, got $smoothing")
    val cents = round(col(targetCol) * 100, 0).cast(LongType)
    val g = df.where(col(targetCol).isNotNull)
      .agg(sum(cents).as("gs"), count(lit(1)).as("gn")).head()
    require(!g.isNullAt(1) && g.getLong(1) > 0, s"no non-null $targetCol")
    val prior = g.getLong(0).toDouble / 100.0 / g.getLong(1)
    val enc = (col("__ts").cast(DoubleType) / 100.0 + lit(smoothing) * lit(prior)) /
      (col("__tn").cast(DoubleType) + lit(smoothing))
    val mapping = df.where(col(catCol).isNotNull && col(targetCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(cents).as("__ts"), count(lit(1)).as("__tn"))
      .withColumn(s"${catCol}_tenc", round(enc, 4))
      .drop("__ts", "__tn")
    df.join(mapping, Seq(catCol), "left")
      .withColumn(s"${catCol}_tenc",
        coalesce(col(s"${catCol}_tenc"), round(lit(prior), 4)))
  }

  /** Exact linearly-interpolated order statistics at ranks p·(n−1) over the
    * non-null values — the shared path under [[fitQuantileBins]],
    * [[fitRobust]] and [[fitWinsor]]: identical to SQL `quantile_cont`,
    * never `percentile`'s single-process distinct-value merge. Result is
    * aligned with `ps`.
    */
  private def exactQuantiles(df: DataFrame, valueCol: String,
                             ps: Seq[Double]): Seq[Double] = {
    // try_cast: non-numeric values become null under ANSI mode instead of
    // failing the job — fits coerce, they don't validate
    val proj = df.select(col(valueCol).try_cast(DoubleType).as(valueCol))
    // count AFTER the double cast: values that cast to null must not
    // inflate the rank targets past the end of the order-statistics
    // table, where interpolation would yield NaN fits that disable
    // clamps silently. Two passes by design: this narrow count scan is
    // strictly cheaper than the melt pass, and folding it in would mean
    // caching a per-value count table that is row-scale for continuous
    // columns.
    val nonNull = proj.where(col(valueCol).isNotNull).count()
    require(nonNull > 0, s"no non-null numeric values in $valueCol")
    val targets = Map(valueCol -> ps.map(p => p * (nonNull - 1)))
    graft.stats.Describe.exactQuantiles(proj, targets)(valueCol)
  }

  /** Fitted robust-scaling parameters: exact interpolated quartiles
    * (median + IQR), the outlier-immune alternative to [[ScaleFit]]'s
    * mean/std — three doubles of driver state.
    */
  final case class RobustFit(q1: Double, median: Double, q3: Double) {
    def iqr: Double = q3 - q1
  }

  /** The same sort-free order-statistics machinery as [[fitQuantileBins]]
    * for the exact 25/50/75th percentiles.
    */
  def fitRobust(df: DataFrame, valueCol: String): RobustFit = {
    val Seq(q1, med, q3) = exactQuantiles(df, valueCol, Seq(0.25, 0.5, 0.75))
    RobustFit(q1, med, q3)
  }

  /** Median/IQR scaling under a fit: (x − median)/IQR rounded to 4
    * places — sklearn's RobustScaler shape. Pure projection (fit rides the
    * plan as literals); constant-ish columns (IQR = 0) map to 0.0, never
    * NaN/Infinity, consistent with [[standardize]].
    */
  def robustScale(fit: RobustFit)(c: Column): Column = {
    if (fit.iqr == 0.0) return when(c.isNotNull, lit(0.0))
    round((c.cast(DoubleType) - lit(fit.median)) / lit(fit.iqr), 4)
  }

  /** Fitted winsorization bounds: the exact interpolated `lower`/`upper`
    * quantiles of the column.
    */
  final case class WinsorFit(lo: Double, hi: Double)

  def fitWinsor(df: DataFrame, valueCol: String,
                lower: Double = 0.01, upper: Double = 0.99): WinsorFit = {
    require(lower >= 0 && upper <= 1 && lower < upper,
      s"need 0 <= lower < upper <= 1, got ($lower, $upper)")
    val Seq(lo, hi) = exactQuantiles(df, valueCol, Seq(lower, upper))
    WinsorFit(lo, hi)
  }

  /** Tail clipping under a fit: values clamp into [lo, hi], rounded to 4
    * places — the standard heavy-tail damper before scaling. Pure
    * null-preserving projection, no join, no shuffle at apply time.
    * The explicit null gate matters: `least`/`greatest` SKIP null
    * arguments (in Spark and ANSI SQL alike), so without it a null value
    * would silently clamp to a bound instead of staying null.
    */
  def winsorize(fit: WinsorFit)(c: Column): Column =
    when(c.isNotNull,
      round(greatest(least(c.cast(DoubleType), lit(fit.hi)), lit(fit.lo)), 4))

  /** Fitted quantile-bin boundaries (pd.qcut's `duplicates="drop"`
    * semantics): the interior exact quantiles with duplicate boundary
    * values collapsed. At most bins−1 doubles of driver state.
    */
  final case class QuantileBinFit(boundaries: Array[Double])

  /** Fit pd.qcut-equivalent bin boundaries on the FULL column: exact
    * linearly-interpolated order statistics at ranks p·(n−1) for
    * p = 1/bins … (bins−1)/bins — the same shared order-statistics path
    * describe and dependence use (never `percentile`'s single-process
    * distinct-value merge), identical to SQL `quantile_cont`. Duplicate
    * boundaries (heavy repeated values) drop, matching the reference's
    * `pd.qcut(duplicates="drop")` (`_bin_numeric_cols_into_categories
    * .py:4-27`). A column with no numeric values raises (as pd.qcut
    * does), rather than returning a degenerate everything-in-bin-0 fit.
    */
  def fitQuantileBins(df: DataFrame, valueCol: String,
                      bins: Int): QuantileBinFit = {
    require(bins > 1, s"need bins > 1, got $bins")
    val qs = (1 until bins).map(_.toDouble / bins)
    QuantileBinFit(exactQuantiles(df, valueCol, qs)
      .filterNot(_.isNaN).distinct.sorted.toArray)
  }

  /** Bin code under a fit: the number of boundaries strictly below the
    * value (0 = lowest bin), null-preserving — one codegen `when` chain,
    * no join, no shuffle at apply time.
    */
  def quantileBin(fit: QuantileBinFit)(c: Column): Column = {
    val code = fit.boundaries.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (b, i)) => when(c > lit(b), lit(i + 1)).otherwise(acc)
    }
    when(c.isNotNull, code.cast(LongType))
  }
}
