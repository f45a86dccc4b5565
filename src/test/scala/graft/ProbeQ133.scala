package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: FastSS vs PassJoin on the supplier-name fuzzy join. */
object ProbeQ133 {
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
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val only = if (args.length > 1) args(1) else "both"
    val sup = Queries.table(spark, dir, "supplier")
    sup.count()
    for (i <- 1 to 2) {
      val nf = time(s"fastss run$i")(
        ops.RecordLinkage.deletionSelf(sup, "s_suppkey", "s_name", 4096).count())
      if (only != "fastss") {
        val np = time(s"passjoin run$i")(
          ops.RecordLinkage.passJoinSelf(sup, "s_suppkey", "s_name", 1, 4096).count())
        println(s"[probe] rows fastss=$nf passjoin=$np agree=${nf == np}")
      } else println(s"[probe] rows fastss=$nf")
    }
    spark.stop()
  }
}
