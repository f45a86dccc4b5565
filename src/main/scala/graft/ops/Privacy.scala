package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Privacy-risk profiling for release governance: k-anonymity and
  * l-diversity over declared quasi-identifier columns — the
  * re-identification counterpart to the PII scanners (Sweeney 2002;
  * Machanavajjhala et al. 2007). A corpus that passes PII redaction can
  * still leak identity through rare attribute COMBINATIONS; these reports
  * measure that tail before data ships.
  *
  * Scale shape: one hash-groupBy on the quasi-identifier tuple builds the
  * equivalence-class table (the only row-scale shuffle), then one bounded
  * aggregation reduces it to a single report row — class-table rows never
  * reach the driver. Nulls form their own class on both sides of the
  * oracle (Spark and SQL GROUP BY agree on null grouping).
  */
object Privacy {

  /** k-anonymity profile: equivalence classes are rows sharing the
    * quasi-identifier tuple; a dataset is k-anonymous iff every class has
    * at least k members. Output (one row): (k, n_rows, n_classes,
    * min_class_size, classes_below_k, rows_below_k, share_below_k,
    * is_k_anonymous).
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"need k >= 2, got $k")
    qiCols.foreach(c => require(df.columns.contains(c),
      s"quasi-identifier '$c' not in frame"))
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    classes.agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__sz")).as("min_class_size"),
        count(when(col("__sz") < k, lit(1))).as("classes_below_k"),
        coalesce(sum(when(col("__sz") < k, col("__sz"))), lit(0L))
          .as("rows_below_k"))
      .select(lit(k).cast(LongType).as("k"),
        col("n_rows"), col("n_classes"), col("min_class_size"),
        col("classes_below_k"), col("rows_below_k"),
        round(col("rows_below_k").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("share_below_k"),
        (col("min_class_size") >= k).as("is_k_anonymous"))
  }

  /** l-diversity profile: within each quasi-identifier class, the number
    * of DISTINCT sensitive values; a dataset is l-diverse iff every class
    * carries at least l. Null sensitive values don't count as a distinct
    * value (count_distinct skips them — a class of only-null sensitives
    * has diversity 0). Output (one row): (l, n_classes, min_diversity,
    * classes_below_l, rows_below_l, share_below_l, is_l_diverse).
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"need l >= 2, got $l")
    (qiCols :+ sensitiveCol).foreach(c => require(df.columns.contains(c),
      s"column '$c' not in frame"))
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col(sensitiveCol)).as("__div"))
    classes.agg(
        sum(col("__sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("__div")).as("min_diversity"),
        count(when(col("__div") < l, lit(1))).as("classes_below_l"),
        coalesce(sum(when(col("__div") < l, col("__sz"))), lit(0L))
          .as("rows_below_l"))
      .select(lit(l).cast(LongType).as("l"),
        col("n_classes"), col("min_diversity"),
        col("classes_below_l"), col("rows_below_l"),
        round(col("rows_below_l").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("share_below_l"),
        (col("min_diversity") >= l).as("is_l_diverse"))
  }
}
