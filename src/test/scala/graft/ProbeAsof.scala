package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16): skew-split asofJoin vs the pre-r16 whole-key
  * union-sort control (`AssumeLight` IS the pre-r16 plan). Clicks probe
  * purchases per user — the q68 shape at replica scale, where a zipf
  * hot actor concentrates both sides of the history into one key.
  */
object ProbeAsof {
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
    val ev = Queries.table(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value"))
    def run(split: ops.HeavySplit): DataFrame =
      ops.AsofJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "value"), segmentSeconds = 86400L,
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
      println(f"[asof] $name%-14s $best%6.2fs")
    }
    spark.stop()
  }
}
