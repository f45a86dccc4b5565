package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r15): the skew-split Sessionize vs the pre-r15 whole-key
  * window control, on a given events dir — the [[ProbePaths]] pattern
  * (live A/B through the production API so the probe can never drift
  * from the shipped operator). `AssumeLight` IS the pre-r15 plan (one
  * whole-key window, no pre-scan), so the control needs no re-coded
  * twin; `Known(allHeavy)` forces every key through the segmented
  * machinery.
  */
object ProbeSessions {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/g30"
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
    def run(split: ops.HeavySplit): DataFrame =
      ops.Sessionize.sessionStats(evs, "user_id", "ts",
        gapSeconds = 3600L, orderCols = Seq("event_id"),
        segmentSeconds = 86400L,
        segmentThreshold = ops.EventAnalytics.DefaultSegmentThreshold,
        split = split)
    for ((name, fn) <- Seq(
        "light-control" -> (() => run(ops.HeavySplit.AssumeLight)),
        "split-default" -> (() => run(ops.HeavySplit.Detect)),
        "all-segmented" -> (() => run(
          ops.HeavySplit.Known(Nil, allHeavy = true))))) {
      fn().queryExecution.toRdd.count() // warm
      val best = (1 to 3).map(_ =>
        t(fn().queryExecution.toRdd.count())).min
      println(f"[sessions] $name%-14s $best%6.2fs")
    }
    spark.stop()
  }
}
