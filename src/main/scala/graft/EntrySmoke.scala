package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's entry() smoke: a BARE session (no
  * GraftExtensions, no nanosAsLong, default shuffle partitions).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[entrysmoke] rows=$n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
