package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dev probe (r17): append the UNSORTED grouped-quantiles pipeline plan
  * (the work hidden behind the lazy checkpoint boundary) to the r17
  * q172/q175 after-plan files so the plan evidence shows the full shape.
  */
object ProbeGqPlan {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Queries.table(spark, dir, "lineitem")
    val u172 = stats.Describe.groupedQuantilesUnsorted(li,
      Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.9))
    val u175 = stats.Describe.groupedQuantilesUnsorted(
      li.withColumn("flag_or_null", nullif(col("l_returnflag"), lit("N"))),
      Seq("flag_or_null"), "l_extendedprice", Seq(0.5, 0.9))
    def app(path: String, df: org.apache.spark.sql.DataFrame): Unit =
      Files.writeString(Paths.get(path),
        "\n\n== The pipeline BEHIND the lazy localCheckpoint boundary " +
          "(groupedQuantilesUnsorted) ==\n" +
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode),
        StandardOpenOption.APPEND)
    app("/root/repo/plans/r17/q172_after.txt", u172)
    app("/root/repo/plans/r17/q175_after.txt", u175)
    println("[gqplan] appended")
    spark.stop()
  }
}
