package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-drift measurement between two slices of the same table
  * (yesterday vs today, reference vs candidate corpus) — the monitoring
  * layer over the profiling suite.
  *
  * PSI (population stability index): Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over shared
  * categories/bins, with the standard ε-floor for empty cells so the sum
  * is always finite. Conventional reading: < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  *
  * Scale shape: one count aggregation per side (bounded by the category /
  * bin vocabulary), a full outer join of two vocabulary-sized tables, and
  * per-cell arithmetic — nothing row-scale ever reaches the driver or a
  * wide shuffle.
  */
object Drift {

  /** PSI over a categorical column: per-category shares from each side,
    * full-outer-joined so categories absent on one side contribute via the
    * ε floor. Output: one row — (column_name, psi, n_categories).
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame, column: String,
                     epsilon: Double = 1e-6): DataFrame = {
    val r = shares(ref, column, "p")
    val c = shares(cur, column, "q")
    val joined = r.join(c, Seq("value"), "outer")
      .select(
        coalesce(col("p"), lit(0.0)).as("p"),
        coalesce(col("q"), lit(0.0)).as("q"))
    psiOf(joined, column, epsilon)
  }

  /** PSI over a numeric column: bin BOTH sides with boundaries fitted on
    * the REFERENCE side ([[FeaturePrep.fitQuantileBins]] — exact
    * interpolated deciles by default), then categorical PSI over the bin
    * codes. Fitting on the reference is the standard convention: the bins
    * are the stable yardstick, the candidate is measured against it.
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, column: String,
                 bins: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    val fit = FeaturePrep.fitQuantileBins(ref, column, bins)
    def binned(df: DataFrame): DataFrame =
      df.where(col(column).isNotNull)
        .select(FeaturePrep.quantileBin(fit)(col(column))
          .cast(StringType).as(column))
    psiCategorical(binned(ref), binned(cur), column, epsilon)
  }

  /** Fit the reference share table driver-side — vocabulary-bounded by
    * construction — for
    * [[graft.streaming.StreamingFrame.streamingDrift]]'s literal plan.
    * Sorted by category for a deterministic aggregation layout.
    */
  def fitShares(ref: DataFrame, column: String): Seq[(String, Double)] =
    shares(ref, column, "p").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).sortBy(_._1).toSeq

  /** SCALE NOTE: the empty-partition window runs over the post-aggregation
    * per-VALUE count table — vocabulary-sized by PSI's construction
    * (categorical levels or ≤ `bins` quantile labels), never the input —
    * so the single window task holds at most |vocabulary| slim rows.
    */
  private def shares(df: DataFrame, column: String, out: String): DataFrame = {
    val counts = df.where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("n"))
    val total = sum(col("n")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    counts.select(col("value"), (col("n").cast(DoubleType) / total).as(out))
  }

  private def psiOf(pq: DataFrame, column: String,
                    epsilon: Double): DataFrame = {
    val p = greatest(col("p"), lit(epsilon))
    val q = greatest(col("q"), lit(epsilon))
    pq.agg(
        round(sum((p - q) * log(p / q)), 6).as("psi"),
        count(lit(1)).as("n_categories"))
      .select(lit(column).as("column_name"), col("psi"), col("n_categories"))
  }
}
