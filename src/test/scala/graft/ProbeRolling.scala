package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r15): the whole-key RANGE-window rollingAggregate's
  * hot-actor cost — uniform vs zipf replica, same volume — recording
  * the measured hazard bound behind the documented posture decision
  * (the op keeps the whole-key window; see TimeSeries.rollingAggregate
  * scaladoc).
  */
object ProbeRolling {
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
    def run() = ops.TimeSeries.rollingAggregate(evs, "user_id", "ts",
      "value", windowSeconds = 86400L)
    // r16: the two-bucket min/max decomposition — partitioned by
    // (key, bucket), so the zipf hot key should NOT pay the whole-key
    // sort rollingAggregate still does
    def runEx() = ops.TimeSeries.rollingExtrema(evs, "user_id", "ts",
      "value", windowSeconds = 86400L)
    def runB() = ops.TimeSeries.rollingAggregateBucketed(evs, "user_id",
      "ts", "value", windowSeconds = 86400L)
    for ((name, fn) <- Seq("cum-diff" -> (() => run()),
        "extrema" -> (() => runEx()),
        "bucketed" -> (() => runB()))) {
      fn().queryExecution.toRdd.count() // warm
      val best = (1 to 3).map(_ =>
        t(fn().queryExecution.toRdd.count())).min
      println(f"[rolling] $name%-10s $dir%-18s $best%6.2fs")
    }
    spark.stop()
  }
}
