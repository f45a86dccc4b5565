package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: count() vs toRdd.count() — does count()-pruning distort the
  * bench readings for projection-/sort-shaped queries?
  */
object ProbeAction {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q24_lang_id", "q135_c4_clean", "q133_fuzzy_join",
        "q92_bpe_train", "q111_tokenize_pack", "q66_gopher_rules")
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
    for (n <- names if Queries.all.contains(n)) {
      val fn = Queries.all(n)
      fn(spark, sfDir).count()  // warm
      val c = (1 to 3).map(_ => t(fn(spark, sfDir).count())).min
      val r = (1 to 3).map(_ => t(fn(spark, sfDir).queryExecution.toRdd.count())).min
      println(f"[action] $n%-24s count=$c%6.2fs toRdd=$r%6.2fs ratio=${r / c}%5.2f")
    }
    spark.stop()
  }
}
