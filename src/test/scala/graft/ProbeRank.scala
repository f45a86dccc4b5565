package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe (r17): q06 spearman — single-task vs range-partitioned rank
  * table for the near-unique price column, and the join-back cost, one
  * JVM, alternating.
  */
object ProbeRank {
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
    val prep = Queries.table(spark, dir, "lineitem").select(
      col("l_quantity").cast(DoubleType).as("q"),
      col("l_extendedprice").cast(DoubleType).as("v")).cache()
    run(prep.groupBy().count())

    def singleTask(): DataFrame = {
      val counts = prep.where(col("v").isNotNull)
        .groupBy(col("v").as("__v")).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      counts
        .withColumn("__cumLess", coalesce(sum(col("__c")).over(w), lit(0L)))
        .select(col("__v"),
          (col("__cumLess") + (col("__c") + 1) / 2.0).as("__avg_rank"))
    }
    def ranged(): (DataFrame, () => Unit) = {
      val parts = 32
      val counts = prep.where(col("v").isNotNull)
        .groupBy(col("v").as("__v")).agg(count(lit(1)).as("__c"))
        .repartitionByRange(parts, col("__v"))
        .withColumn("__pid", spark_partition_id())
        .cache()
      val partSums = counts.groupBy("__pid").agg(sum("__c").as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sortedPids = partSums.keys.toSeq.sorted
      val prefix = sortedPids.scanLeft(0L)((acc, p) => acc + partSums(p))
      val offsetOf = sortedPids.zip(prefix).toMap
      val offExpr = sortedPids.foldLeft(lit(0L)) { (acc, p) =>
        when(col("__pid") === p, lit(offsetOf(p))).otherwise(acc)
      }
      val w = Window.partitionBy("__pid").orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      (counts
        .withColumn("__cumLess", coalesce(sum(col("__c")).over(w), lit(0L)))
        .select(col("__v"),
          (col("__cumLess") + offExpr + (col("__c") + 1) / 2.0)
            .as("__avg_rank")),
        () => { counts.unpersist(); () })
    }
    def joinAgg(rt: DataFrame): Double = {
      val d = prep.join(broadcast(rt), prep("v") === rt("__v"), "left")
      t(d.agg(corr(col("q"), col("__avg_rank"))).head())
    }
    // warm
    run(singleTask()); { val (r, c) = ranged(); run(r); c() }
    val rs = (1 to 4).map { _ =>
      val a = t(run(singleTask()))
      val (r, c) = ranged(); val bBuild = t(run(r))
      val aj = joinAgg(singleTask())
      val bj = joinAgg(r)
      c()
      (a, bBuild, aj, bj)
    }
    println(f"[rank] table single  ${rs.map(_._1).min}%6.3f  ranged ${rs.map(_._2).min}%6.3f")
    println(f"[rank] join+agg sgl  ${rs.map(_._3).min}%6.3f  ranged ${rs.map(_._4).min}%6.3f")
    prep.unpersist()
    spark.stop()
  }
}
