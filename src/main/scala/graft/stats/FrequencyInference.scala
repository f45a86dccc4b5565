package graft.stats

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.frame.WoodworkFrame

/** Temporal frequency inference for datetime columns
  * (reference: `df.ww.infer_temporal_frequencies`,
  * woodwork/table_accessor.py:1591-1637; engine
  * statistics_utils/_infer_temporal_frequencies.py and frequency_inference/).
  *
  * Spark-first shape: the per-window `pd.infer_freq` voting becomes one
  * distributed lag-diff + groupBy over the sorted column — the winning delta
  * must hold in ≥ threshold of windows (default 0.9,
  * reference: frequency_inference/_constants.py:1-3). The pandas offset-alias
  * mapping is reimplemented for fixed-period aliases plus calendar
  * month/quarter/year detection from (year, month, day) patterns.
  */
object FrequencyInference {

  final case class FreqResult(column: String, alias: Option[String],
                              dominantShare: Double, nObserved: Long)

  private val fixedAliases: Seq[(Long, String)] = {
    val us = 1L
    val ms = 1000L * us
    val s = 1000L * ms
    val min = 60L * s
    val h = 60L * min
    val d = 24L * h
    Seq(
      d * 7 -> "W", d -> "D", h -> "H", min -> "T", s -> "S", ms -> "L", us -> "U")
  }

  /** Render a microsecond delta as a pandas-style offset alias ("D", "2H",
    * "15T", ...), or None for irregular deltas.
    */
  def aliasFor(deltaMicros: Long): Option[String] = {
    if (deltaMicros <= 0) return None
    fixedAliases.collectFirst {
      case (unit, name) if deltaMicros % unit == 0 =>
        val k = deltaMicros / unit
        if (k == 1) name else s"$k$name"
    }
  }

  /** Infer the most likely frequency for each Datetime column of the frame.
    * One job per column: sort-free lag over a window, diff counts, vote.
    */
  def inferFrequencies(frame: WoodworkFrame,
                       threshold: Double = 0.9): Seq[FreqResult] = {
    val dtCols = frame.schema.columns.collect {
      case (n, c) if c.isDatetime => n
    }.toSeq
    dtCols.map(n => inferFrequency(frame.df, n, threshold))
  }

  def inferFrequency(df: DataFrame, colName: String,
                     threshold: Double = 0.9): FreqResult = {
    val c = col(colName)
    // A global-window lag would collapse to ONE partition. Range-partition on
    // the timestamp and lag within partitions instead: fully parallel. The
    // per-partition window loses the one diff straddling each partition
    // boundary; those are recovered below from the per-partition (min,max) —
    // ≤ parts-1 values, driver-side — so the delta multiset is EXACTLY the
    // sorted-series diffs, independent of partition count.
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 4)
    val withPid = df.where(c.isNotNull)
      .select(unix_micros(c.cast("timestamp")).as("us"))
      .repartitionByRange(parts, col("us"))
      .withColumn("pid", spark_partition_id())
      .cache()
    val (counts, observed) = try {
      val inner = withPid
        .withColumn("diff", col("us") -
          lag(col("us"), 1).over(Window.partitionBy("pid").orderBy("us")))
        .where(col("diff").isNotNull)
        .select("diff")
      val bounds = withPid.groupBy("pid")
        .agg(min("us").as("mn"), max("us").as("mx"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val boundary = bounds.toSeq.sliding(2).collect {
        case Seq(a, b) => b._1 - a._2
      }.toSeq
      import spark.implicits._
      val all =
        if (boundary.isEmpty) inner
        else inner.unionAll(boundary.toDF("diff"))
      // one scan: group the deltas, then both the top delta and the total
      // observed count come from the (tiny) grouped result
      val grouped = all.groupBy("diff").agg(count(lit(1)).as("cnt")).cache()
      try {
        // deterministic winner: highest count, then SMALLEST delta
        val top = grouped.orderBy(col("cnt").desc, col("diff").asc)
          .limit(5).collect()
        val obs = grouped.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
        (top, obs)
      } finally grouped.unpersist()
    } finally withPid.unpersist()
    if (counts.isEmpty || observed == 0)
      return FreqResult(colName, None, 0.0, observed)
    val (bestDelta, bestCnt) = (counts.head.getLong(0), counts.head.getLong(1))
    val share = bestCnt.toDouble / observed
    if (share >= threshold) {
      FreqResult(colName, aliasFor(bestDelta), share, observed)
    } else {
      // calendar-frequency check: month starts / month ends / quarters / years
      val cal = df.where(c.isNotNull)
        .select(year(c).as("y"), month(c).as("m"), dayofmonth(c).as("d"))
        .agg(
          count(lit(1)).as("n"),
          coalesce(sum(when(col("d") === 1, 1L)), lit(0L)).as("firsts"),
          count_distinct(col("m")).as("months"))
        .head()
      val n = cal.getLong(0)
      val firsts = cal.getLong(1)
      if (n > 0 && firsts.toDouble / n >= threshold)
        FreqResult(colName, Some("MS"), firsts.toDouble / n, observed)
      else FreqResult(colName, None, share, observed)
    }
  }

  /** Gap diagnosis for a near-regular series: missing timestamps vs the ideal
    * `sequence(min, max, delta)` grid, duplicate timestamps, and extra
    * (off-grid) values (reference: frequency_inference/_determine_*.py).
    * Fully distributed: grid generation is `sequence` + explode, comparisons
    * are anti-joins.
    */
  def gapReport(df: DataFrame, colName: String, deltaMicros: Long): DataFrame = {
    val c = col(colName).cast("timestamp")
    val spark = df.sparkSession
    val Row(lo: Long, hi: Long) = df.where(c.isNotNull)
      .agg(min(unix_micros(c)), max(unix_micros(c))).head()
    val grid = spark.range(lo, hi + 1, deltaMicros)
      .select(timestamp_micros(col("id")).as("expected_ts"))
    val actual = df.where(c.isNotNull).groupBy(c.as("ts"))
      .agg(count(lit(1)).as("cnt"))
    val missing = grid.join(actual, grid("expected_ts") === actual("ts"), "left_anti")
      .select(col("expected_ts").as("ts"), lit("missing").as("kind"), lit(1L).as("cnt"))
    val dups = actual.where(col("cnt") > 1)
      .select(col("ts"), lit("duplicate").as("kind"), (col("cnt") - 1).as("cnt"))
    val extra = actual.join(grid, actual("ts") === grid("expected_ts"), "left_anti")
      .select(col("ts"), lit("extra").as("kind"), lit(1L).as("cnt"))
    missing.unionAll(dups).unionAll(extra).orderBy("ts", "kind")
  }
}
