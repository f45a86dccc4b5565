package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r17): where do q05/q06/q34's seconds go — prep cache, the
  * pass-1 wide agg, rank tables, the rank join, the EMI driver loop?
  */
object ProbeDependence {
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
    // EMI standalone (driver-only): the q34/q07 AMI correction at sf0.1
    // magnitudes — 10x10 bins over ~150k orders rows
    val n = 150000L
    val a = Array.fill(10)(n / 10)
    val b = Array.fill(10)(n / 10)
    val emiT = t { stats.Ami.expectedMutualInfo(a, b, n) }
    println(f"[dep] EMI 10x10 N=150k     $emiT%6.2fs (per pair, driver)")
    val a2 = Array.fill(3)(n / 3)
    val emiT2 = t { stats.Ami.expectedMutualInfo(a2, Array.fill(5)(n / 5), n) }
    println(f"[dep] EMI 3x5   N=150k     $emiT2%6.2fs")
    // q05/q06 end-to-end (fresh plans, alternating)
    def q05() = Queries.q05PearsonLineitem(spark, dir)
    def q06() = Queries.q06SpearmanLineitem(spark, dir)
    def q34() = Queries.q34DependenceMax(spark, dir)
    def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count() }
    run(q05()); run(q06())
    println(f"[dep] q05 ${(1 to 3).map(_ => t(run(q05()))).min}%6.2f")
    println(f"[dep] q06 ${(1 to 3).map(_ => t(run(q06()))).min}%6.2f")
    run(q34())
    println(f"[dep] q34 ${(1 to 3).map(_ => t(run(q34()))).min}%6.2f")
    // pieces: typed frame prep + pass-1 agg only
    val f = Queries.lineitemFrame(spark, dir)
      .apply(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_shipdate"))
    println(f"[dep] frame.df build+count ${t(f.df.count())}%6.2f")
    import org.apache.spark.sql.types._
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val schema = f.schema
    val prepCols = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_shipdate").map { nm =>
      val c = schema(nm)
      val raw = col(nm)
      val v =
        if (c.isDatetime) unix_micros(raw.cast(TimestampType)).cast(DoubleType)
        else raw.cast(DoubleType)
      v.as(nm)
    }
    val prepped = f.df.select(prepCols: _*)
    println(f"[dep] prep noop        ${(1 to 3).map(_ => t(noop(f.df.select(prepCols: _*)))).min}%6.2f")
    val cached = prepped.cache()
    println(f"[dep] cache populate   ${t(noop(cached))}%6.2f")
    val aggs = Seq(count(lit(1)).as("total")) ++
      prepCols.indices.map(i => approx_count_distinct(col(prepped.columns(i))).as(s"nun$i")) ++
      prepped.columns.combinations(2).map(p => corr(col(p(0)), col(p(1))).as(s"c_${p(0)}_${p(1)}")).toSeq
    println(f"[dep] wide agg cached  ${(1 to 3).map(_ => t(cached.agg(aggs.head, aggs.tail: _*).head())).min}%6.2f")
    val aggsNoAcd = Seq(count(lit(1)).as("total")) ++
      prepped.columns.map(c => count(col(c)).as(s"cnt_$c")).toSeq ++
      prepped.columns.combinations(2).map(p => corr(col(p(0)), col(p(1))).as(s"c2_${p(0)}_${p(1)}")).toSeq
    println(f"[dep] agg corr-only    ${(1 to 3).map(_ => t(cached.agg(aggsNoAcd.head, aggsNoAcd.tail: _*).head())).min}%6.2f")
    val aggsAcdOnly = prepped.columns.map(c => approx_count_distinct(col(c)).as(s"nn_$c")).toSeq
    println(f"[dep] agg acd-only     ${(1 to 3).map(_ => t(cached.agg(aggsAcdOnly.head, aggsAcdOnly.tail: _*).head())).min}%6.2f")
    cached.unpersist()
    println(f"[dep] wide agg uncached ${(1 to 3).map(_ => t(prepped.agg(aggs.head, aggs.tail: _*).head())).min}%6.2f")
    spark.stop()
  }
}
