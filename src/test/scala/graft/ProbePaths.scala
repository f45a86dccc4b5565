package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (r14): the shipped skew-split topEventPaths vs the pre-r14
  * whole-actor lead() control, on a given events dir. The r14
  * architecture bake-off numbers (array-fold and segment-everything
  * variants, both rejected) are recorded in BENCH_SF1 §r14.2; this
  * probe keeps only the live A/B so it can never drift from the
  * production operator — the segmented internals are exercised through
  * the real API (`segmentThreshold = 1` forces every actor onto the
  * heavy path).
  */
object ProbePaths {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_x30"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val evs = Queries.table(spark, dir, "events")
    // the pre-r14 control: one whole-actor window (unbounded hot task)
    def leadForm(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val base = evs
        .where(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id").as("__a"),
          unix_micros(col("ts").cast(TimestampType)).as("__t"),
          col("event_type").as("__y"), col("event_id").as("__o0"))
      val w = Window.partitionBy(col("__a"))
        .orderBy(col("__t").asc_nulls_last, col("__y").asc_nulls_last,
          col("__o0").asc_nulls_last)
      val stepped = (1 until 3).foldLeft(base) { (d, i) =>
        d.withColumn(s"__y$i", lead(col("__y"), i).over(w))
          .withColumn(s"__t$i", lead(col("__t"), i).over(w))
      }
      val complete = (1 until 3).map(i => col(s"__y$i").isNotNull)
        .reduce(_ && _)
      val gapOk = (1 until 3).map { i =>
        val prev = if (i == 1) col("__t") else col(s"__t${i - 1}")
        col(s"__t$i") - prev <= 172800L * 1000000L
      }.reduce(_ && _)
      stepped.where(complete && gapOk)
        .select(concat_ws(" > ", col("__y"), col("__y1"), col("__y2"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .withColumn("share", col("n").cast(DoubleType) /
          sum(col("n")).over(Window.partitionBy()).cast(DoubleType))
        .orderBy(col("n").desc, col("path").asc).limit(10)
    }
    def shipped(threshold: Long): DataFrame =
      graft.ops.EventAnalytics.topEventPaths(
        evs, "user_id", "ts", "event_type", length = 3, k = 10,
        maxGapSeconds = 172800L, orderCols = Seq("event_id"),
        segmentThreshold = threshold)
    for ((name, fn) <- Seq(
        "lead-control" -> (() => leadForm()),
        "split-default" -> (() => shipped(
          graft.ops.EventAnalytics.DefaultSegmentThreshold)),
        "all-segmented" -> (() => shipped(1L)))) {
      fn().queryExecution.toRdd.count() // warm
      val best = (1 to 3).map(_ =>
        t(fn().queryExecution.toRdd.count())).min
      println(f"[paths] $name%-14s $best%6.2fs")
    }
    spark.stop()
  }
}
