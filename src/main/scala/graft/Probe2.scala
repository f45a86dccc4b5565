package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc decomposition of init/inference cost on one table. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val table = if (args.nonEmpty) args(0) else "lineitem"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val df = time("read")(Queries.table(spark, sfDir, table))
    time("count")(df.count())
    val stats = time("collectStats")(
      graft.infer.TypeInference.collectStats(df, df.columns.toSeq))
    time("inferTypes")(graft.infer.TypeInference.inferTypes(df, df.columns.toSeq))
    val f = time("init")(graft.frame.WoodworkFrame.init(df))
    time("persist+materialize") {
      f.df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.df.count()
    }
    println(s"[probe2] stats keys=${stats.size}")
    spark.stop()
  }
}
