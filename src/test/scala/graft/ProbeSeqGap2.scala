package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Dev probe: replicate the gap-inference sub-frames inline to find the
  * fixed-latency stage (1-pair user_id→value reads 1.7 s for 1500
  * groups — that is overhead, not volume).
  */
object ProbeSeqGap2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(df: => org.apache.spark.sql.DataFrame, label: String): Unit = {
      noop(df)
      println(f"[s2] $label%-18s ${(1 to 3).map(_ => t(noop(df))).min}%6.2fs")
    }
    val ev = Queries.table(spark, sfDir, "events")
      .withColumn("ts_s", unix_seconds(col("ts").cast("timestamp")))
    val (x, y) = ("user_id", "value")
    val p = 32
    val grouped = ev.where(col(x).isNotNull && col(y).isNotNull)
      .groupBy(col(x))
      .agg(min(col(y)).as("__mn0"), max(col(y)).as("__mx0"))
      .repartitionByRange(p, col(x))
      .withColumn("__pid", spark_partition_id())
    best(grouped, "grouped")
    val wp = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = grouped.groupBy("__pid")
      .agg(max_by(col("__mx0"), when(col("__mx0").isNotNull, col(x))).as("__lmx0"),
        max_by(col("__mn0"), when(col("__mx0").isNotNull, col(x))).as("__lmn0"))
      .select(col("__pid"),
        last(col("__lmx0"), ignoreNulls = true).over(wp).as("__cmx0"),
        last(col("__lmn0"), ignoreNulls = true).over(wp).as("__cmn0"))
    val w = Window.partitionBy("__pid").orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, -1)
    val annotated = grouped.select(
      (grouped.columns.map(col).toSeq) ++ Seq(
        last(col("__mx0"), ignoreNulls = true).over(w).as("__pmx0"),
        last(col("__mn0"), ignoreNulls = true).over(w).as("__pmn0")): _*)
      .join(broadcast(carry), "__pid")
    best(annotated, "annotated")
    val pmx = coalesce(col("__pmx0"), col("__cmx0"))
    val pmn = coalesce(col("__pmn0"), col("__cmn0"))
    val keep = col("__mx0").isNotNull && pmx.isNotNull
    val melted = annotated.select(explode(array(
        struct(lit(0).as("pr"), lit("lo").as("s"),
          (col("__mn0").cast(DoubleType) - pmx.cast(DoubleType)).as("g"),
          keep.as("keep")),
        struct(lit(0).as("pr"), lit("hi").as("s"),
          (col("__mx0").cast(DoubleType) - pmn.cast(DoubleType)).as("g"),
          keep.as("keep")))).as("__e"))
      .where(col("__e")("keep"))
      .select(col("__e")("pr").as("__pair"), col("__e")("s").as("__side"),
        col("__e")("g").as("__gap"))
    best(melted, "melted")
    val q = graft.stats.Describe.groupedQuantiles(melted,
      Seq("__pair", "__side"), "__gap", Seq(0.05, 0.95))
    best(q, "walk")
    spark.stop()
  }
}
