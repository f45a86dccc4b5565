package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev probe: dump `.explain("formatted")` for the named queries to
  * files — the r16 optimization round's plan-evidence generator
  * (plans/r16/<query>_{before,after}.txt).
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2) // "before" | "after"
    val names = args(3).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names if Queries.all.contains(n)) {
      val df = Queries.all(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val short = n.takeWhile(_ != '_')
      Files.writeString(Paths.get(s"$outDir/${short}_$suffix.txt"), plan)
      println(s"[plan] wrote $outDir/${short}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
