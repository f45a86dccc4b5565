package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.frame.WoodworkFrame
import graft.stats.Describe

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: typed init (inference + coercion) → describe profile of the
    * numeric columns of lineitem at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val f = WoodworkFrame.init(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    Describe.describe(f, include = Seq("numeric"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all(Queries.q09Literal)
}
