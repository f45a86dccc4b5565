package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc decomposition of q44's steady-state cost. */
object ProbeQ44 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q44probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val o = time("select")(Queries.table(spark, sfDir, "orders")
        .select(date_format(col("o_orderdate"), "dd.MM.yyyy").as("od_str")))
      time("count")(o.count())
      val stats = time("collectStats")(
        infer.TypeInference.collectStats(o, Seq("od_str")))
      time("inferTypes")(infer.TypeInference.inferTypes(o, Seq("od_str")))
      val f = time("init")(frame.WoodworkFrame.init(o))
      time("group+collect")(
        f.df.groupBy(date_format(col("od_str"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("cnt")).orderBy("month").collect())
      println(s"[q44probe] statsKeys=${stats.size}")
    }
    spark.stop()
  }
}
