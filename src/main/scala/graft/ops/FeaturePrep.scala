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
  * Variance uses the population form Σx²/n − (Σx/n)² over exact integer
  * sums — numerically safe here because cents values are integers ≤ ~2³²
  * and n·x² stays far below 2⁶³ for any realistic metric column.
  */
object FeaturePrep {

  /** Fitted scaling parameters for one column, in integer cents. */
  final case class ScaleFit(n: Long, sumCents: Long, sumSqCents: Long,
                            minCents: Long, maxCents: Long) {
    def meanCents: Double = sumCents.toDouble / n
    def varCents2: Double =
      sumSqCents.toDouble / n - meanCents * meanCents
    def stdCents: Double = math.sqrt(math.max(varCents2, 0.0))
  }

  /** One aggregation pass over non-null values. */
  def fitScale(df: DataFrame, valueCol: String): ScaleFit = {
    val cents = round(col(valueCol) * 100).cast(LongType)
    val r = df.where(col(valueCol).isNotNull)
      .select(cents.as("c"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"),
        min(col("c")).as("mn"), max(col("c")).as("mx"))
      .head()
    require(r.getLong(0) > 0, s"no non-null values in $valueCol")
    ScaleFit(r.getLong(0), r.getLong(1), r.getLong(2),
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
    * the stable ordinal encoding for GBDT-style training. One groupBy +
    * a bounded-window rank over the (small) distinct-value table, then a
    * join back (AQE broadcasts vocabulary-sized sides).
    *
    * Output: input columns + `<col>_enc`.
    */
  def frequencyEncode(df: DataFrame, catCol: String): DataFrame = {
    val w = Window.orderBy(col("__cnt").desc, col(catCol).asc)
    val mapping = df.where(col(catCol).isNotNull)
      .groupBy(col(catCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn(s"${catCol}_enc", (row_number().over(w) - 1).cast(LongType))
      .drop("__cnt")
    df.join(mapping, Seq(catCol), "left")
  }
}
