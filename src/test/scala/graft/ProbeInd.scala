package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: inclusion-dependency exact vs HLL-union screen at scale —
  * the IND analog of the FD-screen crossover measurement (BENCH_SF1 §r10).
  */
object ProbeInd {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val li = Queries.table(spark, sfDir, "lineitem")
    val ord = Queries.table(spark, sfDir, "orders")
    import graft.stats.KeyDiscovery._
    def run(s: Screen): Unit = {
      val out = inclusionDependencies(li,
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        ord, Seq("o_orderkey", "o_custkey"), screen = s).collect()
      assert(out.length == 8)
    }
    for (s <- Seq[Screen](Screen.Exact, Screen.Hll)) {
      run(s) // warm
      val best = (1 to 3).map(_ => t(run(s))).min
      println(f"[probeind] dir=$sfDir screen=$s best=$best%6.2fs")
    }
    spark.stop()
  }
}
