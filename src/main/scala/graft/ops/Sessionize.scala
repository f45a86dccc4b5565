package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based event sessionization: a new session starts when the time since
  * the same key's previous event exceeds the gap. The batch analog of
  * Structured Streaming's session windows, and the standard first step of
  * clickstream / user-activity feature pipelines.
  *
  * Scale shape: one shuffle on the key. Both window functions (the lag and
  * the running sum) share the same (key × time-order) window spec, so they
  * ride the SAME exchange/sort, and the per-session aggregation's grouping
  * key starts with the key column — hash-partitioning on the key already
  * co-locates it, so Catalyst inserts no second exchange. Per-key data is
  * processed streamingly by the window operator; nothing is driver-side.
  */
object Sessionize {

  /** Add `session_index` (0-based per key, time-ordered) to an event frame.
    * `orderCols` break timestamp ties deterministically (session membership
    * is tie-order-independent — equal timestamps always land in the same
    * session — but a stable order keeps downstream row output reproducible).
    */
  def withSessions(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long,
                   orderCols: Seq[String] = Seq.empty): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    // cast first: parquet TIMESTAMP_NTZ columns (isAdjustedToUTC=false)
    // are rejected by unix_micros; the session timezone is UTC so the
    // cast is a deterministic reinterpretation
    val us = unix_micros(col(tsCol).cast(TimestampType))
    val order = us.asc +: orderCols.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1)
      .otherwise(0)
    val runningTotal = sum(isNew)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("session_index", (runningTotal - 1).cast(LongType))
  }

  /** Per-session summary: event count, first/last event time (epoch micros,
    * exact on any engine) and duration.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long,
                   orderCols: Seq[String] = Seq.empty): DataFrame = {
    val us = unix_micros(col(tsCol).cast(TimestampType))
    withSessions(df, keyCol, tsCol, gapSeconds, orderCols)
      .groupBy(col(keyCol), col("session_index"))
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
