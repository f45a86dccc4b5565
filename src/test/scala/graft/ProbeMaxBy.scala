package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: pin Spark's max_by semantics for null ordering keys (the
  * multi-y carry relies on null keys being ignored).
  */
object ProbeMaxBy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1, java.lang.Long.valueOf(10L), "a"),
      (1, null.asInstanceOf[java.lang.Long], "z"),
      (2, null.asInstanceOf[java.lang.Long], "q")).toDF("g", "k", "v")
    val r = df.groupBy("g").agg(max_by(col("v"), col("k")).as("m"))
      .orderBy("g").collect()
    println("[mb] g=1 -> " + r(0).get(1) + " (expect a: null keys ignored)")
    println("[mb] g=2 -> " + r(1).get(1) + " (expect null: all keys null)")
    spark.stop()
  }
}
