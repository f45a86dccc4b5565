package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory sketch operators (the mergeable-summaries family —
  * Agarwal et al. 2012 — alongside the HLL sketches in
  * [[graft.stats.IncrementalProfile]]).
  */
object Sketches {

  /** Frequent values of `valueCol` (optionally per group) via the native
    * `ww_heavy_hitters` Misra–Gries aggregate
    * ([[graft.expressions.HeavyHitters]]): at most `capacity` counters per
    * partial buffer, map-side combine, `capacity`-sized summaries through
    * the shuffle — memory and shuffle volume independent of the column's
    * cardinality, unlike `groupBy(value).count` whose aggregation state is
    * one entry per distinct value. Values with true frequency >
    * N/(capacity+1) are guaranteed present; `count_lo ≤ true ≤ count_hi`,
    * exact (lo = hi) whenever distinct ≤ capacity.
    *
    * Output: group columns + (value, count_lo, count_hi), one row per
    * tracked value, heaviest first per group (value asc tie-break).
    *
    * Falls back to the exact window-ranked `groupBy` when the extension
    * isn't registered — identical results in the exact regime, but without
    * the bounded-state property.
    */
  def heavyHitters(df: DataFrame, valueCol: String, capacity: Int,
                   groupCols: Seq[String] = Nil,
                   forceFallback: Boolean = false): DataFrame = {
    require(capacity > 0, s"need capacity > 0, got $capacity")
    val native = !forceFallback &&
      df.sparkSession.catalog.functionExists("ww_heavy_hitters")
    if (native) {
      val gcols = groupCols.map(col)
      df.groupBy(gcols: _*)
        .agg(call_function("ww_heavy_hitters",
          col(valueCol).cast("string"), lit(capacity)).as("hh"))
        .select(gcols :+ explode(col("hh")).as("h"): _*)
        .select(groupCols.map(col) ++ Seq(
          col("h.value").as("value"),
          col("h.count_lo").as("count_lo"),
          col("h.count_hi").as("count_hi")): _*)
    } else {
      val grouped = df.where(col(valueCol).isNotNull)
        .groupBy((groupCols :+ valueCol).map(col): _*)
        .agg(count(lit(1)).as("count_lo"))
      val w =
        if (groupCols.isEmpty) Window.partitionBy()
        else Window.partitionBy(groupCols.map(col): _*)
      grouped
        .withColumn("rk", row_number().over(
          w.orderBy(col("count_lo").desc, col(valueCol).asc)))
        .where(col("rk") <= capacity)
        .select(groupCols.map(col) ++ Seq(
          col(valueCol).cast("string").as("value"),
          col("count_lo"), col("count_lo").as("count_hi")): _*)
    }
  }
}
