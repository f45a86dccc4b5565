package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for [[graft.stats.KeyDiscovery.orderDependencyAgg]]:
  * executes the measure and prints the FINAL adaptive plan. Verified
  * 2026-08-16: the carry-in branch reads the grouped frame back through a
  * ReusedExchange of the range exchange (`ReusedExchange ... Exchange
  * rangepartitioning`), so raw rows are scanned and aggregated exactly
  * ONCE per pair — the q150 derived-stats exchange-reuse pattern. Every
  * SortExec sits above the groupBy(x) aggregate (also spec-pinned in
  * KeyDiscoverySpec).
  */
object ProbeOdPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.range(10000).select(
      pmod(col("id"), lit(500)).as("x"), col("id").as("y"))
    val q = graft.stats.KeyDiscovery.orderDependencyAgg(d, "x", "y", 8)
    val ep = q.queryExecution.executedPlan
    ep.execute().count()
    println("=== executed (AQE final) ===")
    println(ep.toString.take(9000))
    spark.stop()
  }
}
