package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experiment: per-column concurrent group stats vs the single melt job. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val df = Queries.table(spark, sfDir, "lineitem")

    def runConc[A](items: Seq[A])(work: A => Unit): Unit = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(items.map(i => Future(work(i)))), Duration.Inf)
      finally pool.shutdown()
    }

    for (round <- 1 to 3) {
      // A: melt path (what describe uses today)
      val t0 = System.nanoTime()
      val targets = cols.map(n => n -> Seq(0.25, 0.5, 0.75).map(_ * 599999)).toMap
      stats.Describe.meltStatsFull(df, cols, targets, cols.toSet)
      val tMelt = (System.nanoTime() - t0) / 1e9

      // B: concurrent per-column groupBys (pruned scans), window per column
      val t1 = System.nanoTime()
      runConc(cols) { n =>
        val g = df.select(col(n).cast(DoubleType).as("v")).where(col("v").isNotNull)
          .groupBy("v").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        val cum = g.withColumn("cumLess", coalesce(sum("cnt").over(w), lit(0L)))
        val idxs = Seq(0.25, 0.5, 0.75).map(_ * 599999)
        val want = idxs.flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct
        val cond = want.map(ix =>
          col("cumLess") <= ix && lit(ix) < col("cumLess") + col("cnt")).reduce(_ || _)
        // one pass gets mode+nunique, a second the quartile hits
        g.agg(min(struct((-col("cnt")).as("n"), col("v"))), count(lit(1))).head()
        cum.where(cond).collect()
      }
      val tCols = (System.nanoTime() - t1) / 1e9
      println(f"[probe3] round$round melt=$tMelt%.2fs percol=$tCols%.2fs")
    }
    spark.stop()
  }
}
