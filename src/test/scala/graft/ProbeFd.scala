package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: batched fdAgg (one scan, Expand over 2k² distinct groups)
  * vs per-pair concurrent jobs. The measurement (jobs 2.7× faster on the
  * q129 shape) drove functionalDependencies' default to per-pair jobs,
  * with the batched shape kept behind `scanOnce = true`.
  */
object ProbeFd {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cols = Seq("o_orderkey", "o_custkey", "o_orderpriority")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val df = Queries.table(spark, dir, "orders")
    df.count()
    for (_ <- 1 to 3) time("fdAgg (batched)") {
      stats.KeyDiscovery.fdAgg(df, pairs).head()
    }
    for (_ <- 1 to 3) time("per-pair jobs") {
      val acc = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
      graft.util.Concurrency.runConcurrently(pairs.indices) { i =>
        val (a, b) = pairs(i)
        val r = df.agg(
          count_distinct(when(col(b).isNotNull, col(a))).as("__da"),
          count_distinct(col(a), col(b)).as("__dp")).head()
        acc.put(i, (r.getLong(0), r.getLong(1)))
      }
      acc.size
    }
    spark.stop()
  }
}
