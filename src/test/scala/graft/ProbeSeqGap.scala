package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage breakdown of the r16 batched sequential-gap sweep
  * (q198) — where do the seconds live: the melted gap frame, the
  * grouped-quantile walk, or the pivot/join assembly?
  */
object ProbeSeqGap {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val ev = Queries.table(spark, sfDir, "events")
      .withColumn("ts_s", unix_seconds(col("ts").cast("timestamp")))
    // mirror seqDepCandidatePairs over the q198 declaration
    val cs = Seq("event_id", "ts_s", "user_id", "value")
    // the public API: full query
    val full = () => graft.stats.KeyDiscovery.discoverSequentialGaps(
      Seq(("events", ev, cs)), trim = 0.05)
    noop(full()) // warm
    println(f"[seqgap] full noop      = ${(1 to 3).map(_ => t(noop(full()))).min}%6.2fs")
    // one single-pair call per measured sub-shape
    val one = () => graft.stats.KeyDiscovery.inferSequentialGaps(
      ev, Seq("event_id" -> "ts_s"), trim = 0.05)
    noop(one())
    println(f"[seqgap] 1-pair eventid = ${(1 to 3).map(_ => t(noop(one()))).min}%6.2fs")
    val oneU = () => graft.stats.KeyDiscovery.inferSequentialGaps(
      ev, Seq("user_id" -> "value"), trim = 0.05)
    noop(oneU())
    println(f"[seqgap] 1-pair userid  = ${(1 to 3).map(_ => t(noop(oneU()))).min}%6.2fs")
    spark.stop()
  }
}
