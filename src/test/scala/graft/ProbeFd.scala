package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r17): q144/q145 TANE walk — is the per-candidate job cost
  * scan/coercion (cacheable) or the distinct aggregation itself?
  */
object ProbeFd {
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
    def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count() }
    def q145() = Queries.q145StagedFds3(spark, dir)
    def q144() = Queries.q144ScreenedFds(spark, dir)
    run(q145()); run(q144())
    println(f"[fd] q145 ${(1 to 3).map(_ => t(run(q145()))).min}%6.2f")
    println(f"[fd] q144 ${(1 to 3).map(_ => t(run(q144()))).min}%6.2f")
    val o = Queries.table(spark, dir, "orders")
    val one = t(stats.KeyDiscovery.tupleFdAgg(o,
      Seq("o_custkey", "o_orderstatus"), "o_totalprice").head())
    val oc = o.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice").cache()
    oc.count()
    val oneC = t(stats.KeyDiscovery.tupleFdAgg(oc,
      Seq("o_custkey", "o_orderstatus"), "o_totalprice").head())
    val oneC2 = t(stats.KeyDiscovery.tupleFdAgg(oc,
      Seq("o_custkey", "o_orderpriority"), "o_totalprice").head())
    println(f"[fd] one tupleFdAgg raw $one%6.2f  cached $oneC%6.2f / $oneC2%6.2f")
    oc.unpersist()
    spark.stop()
  }
}
