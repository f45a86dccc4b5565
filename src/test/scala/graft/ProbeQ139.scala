package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: one Expand multi-distinct aggregation (current
  * compositeCandidateKeys shape) vs k concurrent per-candidate narrow
  * jobs (the columnEntropy shape) for the q139 lattice.
  */
object ProbeQ139 {
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
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val tuples = (1 to 2).flatMap(k => cols.combinations(k).toSeq)
    val df = Queries.table(spark, dir, "lineitem")
    df.count() // warm scan
    for (_ <- 1 to 3) time("expand (scanOnce)") {
      stats.KeyDiscovery.compositeCandidateKeys(df, tuples,
        scanOnce = true).collect()
    }
    for (_ <- 1 to 3) time("concurrent (default)") {
      stats.KeyDiscovery.compositeCandidateKeys(df, tuples).collect()
    }
    for (_ <- 1 to 3) time("concurrent jobs") {
      val acc = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()
      graft.util.Concurrency.runConcurrently(tuples) { cs =>
        val r = df.agg(
          count(lit(1)).as("n"),
          count_distinct(col(cs.head), cs.tail.map(col): _*).as("d"),
          count(when(cs.map(c => col(c).isNull).reduce(_ || _), lit(1))).as("z"))
          .head()
        acc.put(cs.mkString(","), (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      acc.size
    }
    spark.stop()
  }
}
