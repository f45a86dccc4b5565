package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.frame.WoodworkFrame

/** Top-n value counts for every `category`-tagged column
  * (reference: `df.ww.value_counts`, woodwork/table_accessor.py:1569-1589;
  * statistics_utils/_get_value_counts.py:1-34).
  *
  * One job for all columns: melt to (column, value) pairs, count, rank with a
  * per-column window, keep the top n. No per-column loop, no driver data.
  */
object ValueCounts {

  def valueCounts(frame: WoodworkFrame,
                  topN: Int = 10,
                  dropna: Boolean = false,
                  ascending: Boolean = false): DataFrame = {
    val catCols = frame.schema.columns.collect {
      case (n, c) if c.isCategorical => n
    }.toSeq
    require(catCols.nonEmpty, "No categorical columns for value_counts")
    val entries = catCols.map(n =>
      struct(lit(n).as("column_name"), col(n).cast("string").as("value")))
    var melted = frame.df
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.value"))
    melted =
      if (dropna) melted.where(col("value").isNotNull)
      else melted.withColumn("value", coalesce(col("value"), lit("null")))
    val ord =
      if (ascending) Seq(col("count").asc, col("value").asc)
      else Seq(col("count").desc, col("value").asc)
    val w = Window.partitionBy("column_name").orderBy(ord: _*)
    melted
      .groupBy("column_name", "value").agg(count(lit(1)).as("count"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN)
      .select("column_name", "value", "count", "rn")
  }

  /** Top-x categorical values for one column
    * (reference: statistics_utils/_get_top_values_categorical.py:1-17).
    */
  def topValues(df: DataFrame, colName: String, x: Int = 10): DataFrame =
    df.where(col(colName).isNotNull)
      .groupBy(col(colName).as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("value").asc)
      .limit(x)
}
