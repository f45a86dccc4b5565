package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16 optimization round): where do q190's ~4 s go —
  * the Detect scan, the heavy machinery, or repeated subtree
  * evaluation? Runs the exact q190 fixture under each split policy and
  * times the pieces.
  */
object ProbeAsof2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    def bestOf(f: => Any): Double = { f; (1 to 3).map(_ => t(f)).min }
    val ev = Queries.table(spark, dir, "events")
      .withColumn("k", nullif(col("user_id") % 7, lit(0)))
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "k", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("k"), col("ts"), col("event_id").as("purchase_id"),
        col("value"))
    def run(split: ops.HeavySplit, dir2: String = "backward"): DataFrame =
      ops.AsofJoin.asofJoin(clicks, purchases, Seq("k"), "ts", "ts",
        Seq("purchase_id", "value"), direction = dir2,
        segmentSeconds = 60L, segmentThreshold = 100L, split = split)
    // the detect scan alone (q190's union shape approximated by ev)
    println(f"[asof2] detect-scan    = ${bestOf(
      ops.HeavySplit.detect(ev, "k", "ts", 100L))}%6.2fs")
    val keys = Seq[Any](1L, 2L, 3L, 4L, 5L, 6L, null)
    println(f"[asof2] assume-light   = ${bestOf(
      run(ops.HeavySplit.AssumeLight).queryExecution.toRdd.count())}%6.2fs")
    println(f"[asof2] detect         = ${bestOf(
      run(ops.HeavySplit.Detect).queryExecution.toRdd.count())}%6.2fs")
    println(f"[asof2] known-7keys    = ${bestOf(
      run(ops.HeavySplit.Known(keys)).queryExecution.toRdd.count())}%6.2fs")
    println(f"[asof2] known-allheavy = ${bestOf(
      run(ops.HeavySplit.Known(Nil, allHeavy = true))
        .queryExecution.toRdd.count())}%6.2fs")
    println(f"[asof2] nearest-detect = ${bestOf(
      run(ops.HeavySplit.Detect, "nearest").queryExecution.toRdd.count())}%6.2fs")
    spark.stop()
  }
}
