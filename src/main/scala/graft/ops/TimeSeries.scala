package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series feature operators over event streams: rolling-window
  * aggregates and fixed-interval resampling — the feature-engineering
  * layer the reference's time_index world points at but never implements
  * (woodwork stops at frequency inference; SURVEY §2.5).
  *
  * Money/metric sums use integer cents so every aggregate is
  * order-independent and hash-exact across engines. Windows are
  * per-key RANGE frames over epoch seconds — the shuffle key is the
  * entity, never a global order, so the plan scales with key cardinality
  * and the largest single entity's history bounds a task (external sort,
  * spills — same skew posture as sessionize).
  */
object TimeSeries {

  /** Rolling trailing-window aggregate per key: for every event, the
    * count and integer-cent sum of `valueCol` over [ts − window, ts]
    * (inclusive both ends, RANGE semantics: equal timestamps are peers).
    *
    * Output: input columns + n_window + sum_cents_window.
    */
  def rollingAggregate(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    // epoch MICROS as the range key: sub-second timestamps align exactly
    // in any engine (integer arithmetic, no truncation ambiguity)
    // cast first: TIMESTAMP_NTZ inputs are rejected by unix_micros
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol).cast(TimestampType)))
      .rangeBetween(-windowSeconds * 1000000L, 0)
    val cents = round(col(valueCol) * 100).cast(LongType)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_cents_window", sum(cents).over(w))
  }

  /** Fixed-interval resample: per (group, truncated timestamp) bucket,
    * event count, integer-cent sum, and min/max value — the downsampling
    * step before charting or model features. `unit` is a date_trunc unit
    * ("hour", "day", ...). One shuffle on (group, bucket).
    *
    * Output: (group, bucket, n, sum_cents, min_value, max_value).
    */
  def resample(df: DataFrame, tsCol: String, unit: String,
               groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast(LongType)
    df.select(col(groupCol).as("group"),
        date_trunc(unit, col(tsCol)).as("bucket"),
        cents.as("cents"), col(valueCol).as("v"))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("v")).as("min_value"), max(col("v")).as("max_value"))
  }
}
