package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r17): q140 multi-field linkage stage breakdown — zero-dist
  * pairs, variant table, variant self-pairs, id expansion, verify join.
  */
object ProbeQ140 {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(label: String)(f: => Any): Unit = {
      f
      println(f"[q140] $label%-24s ${(1 to 3).map(_ => t(f)).min}%6.2fs")
    }
    val cust = Queries.table(spark, dir, "customer")
    def q140() = Queries.q140MultiFieldLinkage(spark, dir)
    best("full q140") { run(q140()) }
    val vals = cust.where(col("c_name").isNotNull)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    best("zero selfPairs") {
      noop(ops.SkewJoin.selfPairs(vals, Seq("s"), "id"))
    }
    best("block field full") {
      noop(ops.RecordLinkage.deletionSelf(cust, "c_custkey", "c_name", 4096))
    }
    // deletionSelf pieces
    val zero = ops.SkewJoin.selfPairs(vals, Seq("s"), "id")
      .select(col("x_id").as("id_1"), col("y_id").as("id_2"),
        lit(0).as("dist"))
    def delVariants(s0: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.types._
      val positions = when(length(s0) > 0, sequence(lit(0), length(s0) - 1))
        .otherwise(array().cast(ArrayType(IntegerType)))
      concat(array(s0), transform(positions, p =>
        concat(s0.substr(lit(1), p), s0.substr(p + 2, length(s0)))))
    }
    def variants() = vals.select(col("s")).distinct()
      .select(col("s"), explode(delVariants(col("s"))).as("__var"))
    best("variants build") { noop(variants()) }
    def vpairs() = ops.SkewJoin.selfPairs(variants(), Seq("__var"), "s")
      .withColumn("dist", levenshtein(col("x_s"), col("y_s"), 1))
      .where(col("dist") >= 0)
      .select(col("x_s").as("v1"), col("y_s").as("v2"), col("dist"))
      .distinct()
    best("vpairs") { noop(vpairs()) }
    best("one-expansion") {
      noop(vpairs()
        .join(vals.select(col("s").as("v1"), col("id").as("ia")), "v1")
        .join(vals.select(col("s").as("v2"), col("id").as("ib")), "v2")
        .select(least(col("ia"), col("ib")).as("id_1"),
          greatest(col("ia"), col("ib")).as("id_2"), col("dist")))
    }
    def variantsH() = vals.select(col("s")).distinct()
      .select(col("s"), explode(delVariants(col("s"))).as("__var"))
      .select(col("s"), xxhash64(col("__var")).as("__vh"))
    def vpairsH() = ops.SkewJoin.selfPairs(variantsH(), Seq("__vh"), "s")
      .withColumn("dist", levenshtein(col("x_s"), col("y_s"), 1))
      .where(col("dist") >= 0)
      .select(col("x_s").as("v1"), col("y_s").as("v2"), col("dist"))
      .distinct()
    best("vpairs hashed-key") { noop(vpairsH()) }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    best("vpairs hashed+shj") { noop(vpairsH()) }
    best("vpairs shj") { noop(vpairs()) }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    println("[q140] vpairs rows = " + vpairs().count() +
      " hashed = " + vpairsH().count())
    println("[q140] variant rows = " + variants().count())
    println("[q140] rows customer = " + cust.count())
    spark.stop()
  }
}
