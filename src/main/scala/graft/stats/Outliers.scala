package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Outlier detection: IQR box plot and medcouple-adjusted (skewed) box plot
  * (reference: woodwork/column_accessor.py:389-546; engine
  * statistics_utils/_get_box_plot_info_for_column.py,
  * _get_medcouple_statistic.py, _medcouple_implementation.py).
  *
  * Quantiles are a distributed agg; the medcouple O(n²) kernel runs on a
  * ≤10k-row sample collected to the driver — the same scale bound the
  * reference uses (config medcouple_sample_size), which keeps driver work
  * constant at any table size.
  */
object Outliers {

  final case class BoxPlotInfo(
      low: Double, high: Double,
      q1: Double, median: Double, q3: Double,
      min: Double, max: Double,
      numLow: Long, numHigh: Long,
      method: String)

  private def quantiles(df: DataFrame, colName: String): (Double, Double, Double, Double, Double) = {
    val c = col(colName).cast(DoubleType)
    val r = df.agg(
      percentile(c, lit(Array(0.0, 0.25, 0.5, 0.75, 1.0))).as("q")).head()
    val q = r.getSeq[Double](0)
    (q(0), q(1), q(2), q(3), q(4))
  }

  private def outlierCounts(df: DataFrame, colName: String,
                            low: Double, high: Double): (Long, Long) = {
    val c = col(colName).cast(DoubleType)
    val r = df.agg(
      coalesce(sum(when(c < low, 1L)), lit(0L)),
      coalesce(sum(when(c > high, 1L)), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Standard IQR box plot: bounds q1-1.5·IQR / q3+1.5·IQR clamped to
    * min/max (reference: _get_box_plot_info_for_column.py:69-91).
    */
  def boxPlot(df: DataFrame, colName: String): BoxPlotInfo = {
    val (mn, q1, med, q3, mx) = quantiles(df, colName)
    val iqr = q3 - q1
    val low = math.max(q1 - 1.5 * iqr, mn)
    val high = math.min(q3 + 1.5 * iqr, mx)
    val (nl, nh) = outlierCounts(df, colName, low, high)
    BoxPlotInfo(low, high, q1, med, q3, mn, mx, nl, nh, "box_plot")
  }

  /** Medcouple statistic on a ≤`sampleSize` sample
    * (kernel: med over h(xi,xj) = ((xj-med) + (xi-med)) / (xj-xi) for
    * xi ≤ med ≤ xj; reference: _medcouple_implementation.py:4-37;
    * sampling reference: _get_medcouple_statistic.py:19-44).
    */
  def medcouple(df: DataFrame, colName: String, sampleSize: Int = 10000,
                seed: Long = 42): Double = {
    val c = col(colName).cast(DoubleType)
    val total = df.where(c.isNotNull).count()
    val src = df.where(c.isNotNull).select(c)
    val values =
      (if (total > sampleSize)
        src.sample(withReplacement = false, sampleSize.toDouble / total * 1.1, seed)
          .limit(sampleSize)
      else src).collect().map(_.getDouble(0)).sorted
    medcoupleKernel(values)
  }

  /** Naive medcouple kernel with the exact tie handling of the Hubert &
    * Vandervieren algorithm as implemented by statsmodels (the reference
    * calls that implementation, _medcouple_implementation.py:4-39): for the
    * k observations equal to the median, the k×k tie block takes the signum
    * matrix sign(r + c - (k-1)) instead of 0/0 divisions.
    */
  private[graft] def medcoupleKernel(sorted: Array[Double]): Double = {
    val n = sorted.length
    if (n < 3) return 0.0
    val med =
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val lower = sorted.filter(_ <= med) // ascending: negatives then med-ties
    val upper = sorted.filter(_ >= med) // ascending: med-ties then positives
    val ties = sorted.count(_ == med)
    val tieColStart = lower.length - ties // med-ties are the tail of lower
    val arr = new Array[Double](lower.length * upper.length)
    var k = 0
    var i = 0
    while (i < lower.length) {
      val xi = lower(i)
      var j = 0
      while (j < upper.length) {
        val xj = upper(j)
        arr(k) =
          if (xi == med && xj == med) {
            // signum tie block: rows are upper's tie indices, cols are the
            // last `ties` indices of lower, value = sign(r + c - (ties-1))
            val r = j
            val c = i - tieColStart
            java.lang.Math.signum(r + c - (ties - 1).toDouble)
          } else ((xj - med) - (med - xi)) / (xj - xi)
        k += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(arr)
    val m = arr.length
    if (m == 0) 0.0
    else if (m % 2 == 1) arr(m / 2)
    else (arr(m / 2 - 1) + arr(m / 2)) / 2.0
  }

  /** Medcouple-adjusted bounds: q1 - 1.5·e^(c1·MC)·IQR, q3 + 1.5·e^(c2·MC)·IQR
    * with coefficients from the sample skewness capped at 3.5
    * (reference: _get_box_plot_info_for_column.py:42-66
    * `_determine_coefficients`; exponents -4/3 for left, -3/4·sign pattern).
    */
  def medcoupleBoxPlot(df: DataFrame, colName: String,
                       knownMc: Option[Double] = None): BoxPlotInfo = {
    val (mn, q1, med, q3, mx) = quantiles(df, colName)
    val mc = knownMc.getOrElse(medcouple(df, colName))
    val iqr = q3 - q1
    val skew = df.agg(skewness(col(colName).cast(DoubleType))).head().getDouble(0)
    val cap = 3.5
    val a = math.min(math.abs(skew), cap)
    val (c1, c2) = if (mc >= 0) (-a, a) else (a, -a)
    val low = math.max(q1 - 1.5 * math.exp(c1 * mc) * iqr, mn)
    val high = math.min(q3 + 1.5 * math.exp(c2 * mc) * iqr, mx)
    val (nl, nh) = outlierCounts(df, colName, low, high)
    BoxPlotInfo(low, high, q1, med, q3, mn, mx, nl, nh, "medcouple")
  }

  /** Dispatch heuristic: sampled |MC| < threshold → plain box plot, else
    * medcouple (reference: column_accessor.py:389-439 `get_outliers`,
    * _determine_best_outlier_method at _get_box_plot_info_for_column.py:19-39).
    */
  def bestOutliers(df: DataFrame, colName: String, threshold: Double = 0.3): BoxPlotInfo = {
    val mc = medcouple(df, colName)
    if (math.abs(mc) < threshold) boxPlot(df, colName)
    else medcoupleBoxPlot(df, colName, knownMc = Some(mc))
  }

  /** Rows outside the box-plot bounds, as a DataFrame (distributed; use this
    * instead of collecting outlier values when counts may be large).
    */
  def outlierRows(df: DataFrame, colName: String, info: BoxPlotInfo): DataFrame = {
    val c = col(colName).cast(DoubleType)
    df.where(c < info.low || c > info.high)
  }
}
