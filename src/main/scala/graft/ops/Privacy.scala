package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    requireQi(df, qiCols)
    require(k >= 2, s"need k >= 2, got $k")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    belowThresholdReport(classes, col("__sz"), k,
      thresholdName = "k", measureName = "min_class_size", suffix = "_k",
      verdictName = "is_k_anonymous")
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
    requireQi(df, qiCols)
    require(l >= 2, s"need l >= 2, got $l")
    require(df.columns.contains(sensitiveCol),
      s"column '$sensitiveCol' not in frame")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        count_distinct(col(sensitiveCol)).as("__div"))
    belowThresholdReport(classes, col("__div"), l,
      thresholdName = "l", measureName = "min_diversity", suffix = "_l",
      verdictName = "is_l_diverse")
      .drop("n_rows")
  }

  private def requireQi(df: DataFrame, qiCols: Seq[String]): Unit = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    qiCols.foreach(c => require(df.columns.contains(c),
      s"quasi-identifier '$c' not in frame"))
  }

  /** Shared reduce for both reports: the classes-below-threshold tail and
    * the verdict, from a class table carrying `__sz` (class row count) and
    * the per-class measure. EMPTY-INPUT CONTRACT: zero classes reduce to
    * zeroed counts, share 0.0, and a vacuously-TRUE verdict — never a
    * null verdict that NPEs a release gate's `getBoolean`.
    */
  private def belowThresholdReport(classes: DataFrame, measure: Column,
                                   threshold: Int, thresholdName: String,
                                   measureName: String, suffix: String,
                                   verdictName: String): DataFrame =
    classes.agg(
        coalesce(sum(col("__sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(measure).as(measureName),
        count(when(measure < threshold, lit(1))).as(s"classes_below$suffix"),
        coalesce(sum(when(measure < threshold, col("__sz"))), lit(0L))
          .as(s"rows_below$suffix"))
      .select(lit(threshold).cast(LongType).as(thresholdName),
        col("n_rows"), col("n_classes"),
        coalesce(col(measureName), lit(0L)).as(measureName),
        col(s"classes_below$suffix"), col(s"rows_below$suffix"),
        // explicit zero-rows gate: ANSI mode raises on the 0/0 division
        // long before the coalesce could see a null
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(round(col(s"rows_below$suffix").cast(DoubleType) /
            col("n_rows").cast(DoubleType), 6))
          .as(s"share_below$suffix"),
        coalesce(col(measureName) >= threshold, lit(true)).as(verdictName))
}
