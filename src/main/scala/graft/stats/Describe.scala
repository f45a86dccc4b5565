package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.WoodworkFrame
import graft.types.LogicalType

/** Distributed column profiling (reference: `df.ww.describe`,
  * woodwork/table_accessor.py:1454-1567; engine
  * statistics_utils/_get_describe_dict.py:51-231).
  *
  * Spark-first shape: ONE wide `agg` computes count/nunique/nan_count/mean/
  * std/min/max/quartiles/num_true/num_false for every profiled column in a
  * single scan; modes for all columns come from ONE melt→groupBy→rank job
  * rather than a per-column loop. Nothing is collected but the final
  * per-column stat rows (bounded by table width, not height).
  */
object Describe {

  /** Exact quartiles use SQL `percentile` (sort-based, matching the
    * reference's interpolated exact path, _get_describe_dict.py:163-185);
    * `approx = true` switches to `percentile_approx` — the knob to prefer at
    * 100 TB where an exact percentile is a global sort.
    */
  def describe(frame: WoodworkFrame,
               include: Seq[String] = Nil,
               approx: Boolean = false): DataFrame = {
    val df = frame.df
    val schema = frame.schema
    // index/time_index columns are excluded (reference: _get_describe_dict.py:96-99)
    val base = schema.columns.toSeq
      .filterNot { case (_, c) => c.isIndex || c.isTimeIndex }
    val cols =
      if (include.isEmpty) base
      else {
        val sel = schema.filterCols(include).toSet
        base.filter { case (n, _) => sel.contains(n) }
      }
    require(cols.nonEmpty, "No columns to describe")

    def pct(c: Column, ps: Seq[Double]): Column =
      if (approx) percentile_approx(c, lit(ps.toArray), lit(10000))
      else percentile(c, lit(ps.toArray))

    val aggExprs: Seq[Column] = cols.map { case (n, cs) =>
      val c = col(n)
      val dt = df.schema(n).dataType
      val numericLike = cs.isNumeric && LogicalType.isIntegralType(dt) ||
        LogicalType.isFractionalType(dt)
      val d = if (numericLike) c.cast(DoubleType) else c.cast(DoubleType)
      val isNum = cs.isNumeric
      val isDt = cs.isDatetime
      val isBool = cs.isBoolean
      struct(
        count(lit(1)).as("total"),
        count(c).as("count"),
        (if (isNum) avg(d) else lit(null).cast(DoubleType)).as("mean"),
        (if (isNum) stddev_samp(d) else lit(null).cast(DoubleType)).as("std"),
        (if (isNum) min(d) else lit(null).cast(DoubleType)).as("min"),
        (if (isNum) max(d) else lit(null).cast(DoubleType)).as("max"),
        (if (isBool) coalesce(sum(when(c === true, 1L)), lit(0L))
         else lit(null).cast(LongType)).as("num_true"),
        (if (isBool) coalesce(sum(when(c === false, 1L)), lit(0L))
         else lit(null).cast(LongType)).as("num_false"),
        (if (isDt) min(c).cast(TimestampType) else lit(null).cast(TimestampType)).as("min_dt"),
        (if (isDt) max(c).cast(TimestampType) else lit(null).cast(TimestampType)).as("max_dt"),
        (if (isDt) timestamp_micros(avg(unix_micros(c)).cast(LongType))
         else lit(null).cast(TimestampType)).as("mean_dt")
      ).as(n)
    }

    val statRow = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    // exact nunique and mode BOTH come out of the single melt job below —
    // one scan instead of an N-way count_distinct Expand plus a mode job
    val (modes, nuniques) = meltStats(df, cols.map(_._1))
    // quartiles in their own agg: percentile is a TypedImperativeAggregate
    // and would push the whole wide agg above out of whole-stage codegen
    val numCols = cols.collect { case (n, cs) if cs.isNumeric => n }
    val quartiles: Map[String, Seq[Double]] =
      if (numCols.isEmpty) Map.empty
      else {
        val qExprs = numCols.map(n =>
          pct(col(n).cast(DoubleType), Seq(0.25, 0.5, 0.75)).as(n))
        val qRow = df.agg(qExprs.head, qExprs.tail: _*).head()
        numCols.zipWithIndex.map { case (n, i) =>
          n -> (if (qRow.isNullAt(i)) null else qRow.getSeq[Double](i))
        }.toMap
      }
    val spark = df.sparkSession
    val out = cols.zipWithIndex.map { case ((n, cs), i) =>
      val s = statRow.getStruct(i)
      val total = s.getLong(0); val cnt = s.getLong(1)
      def dOpt(j: Int): Any = if (s.isNullAt(j)) null else s.getDouble(j)
      val quart: Seq[Double] = quartiles.getOrElse(n, null)
      Row(
        n,
        frame.df.schema(n).dataType.simpleString,
        cs.logicalType.name,
        cs.allTags.toSeq.sorted.mkString(";"),
        cnt,
        nuniques.getOrElse(n, 0L),
        total - cnt,
        dOpt(2), dOpt(3), dOpt(4),
        if (quart == null) null else quart(0),
        if (quart == null) null else quart(1),
        if (quart == null) null else quart(2),
        dOpt(5),
        if (s.isNullAt(6)) null else s.getLong(6),
        if (s.isNullAt(7)) null else s.getLong(7),
        modes.getOrElse(n, null),
        if (s.isNullAt(8)) null else s.getTimestamp(8),
        if (s.isNullAt(9)) null else s.getTimestamp(9),
        if (s.isNullAt(10)) null else s.getTimestamp(10)
      )
    }
    val outSchema = StructType(Seq(
      StructField("column_name", StringType, false),
      StructField("physical_type", StringType, false),
      StructField("logical_type", StringType, false),
      StructField("semantic_tags", StringType, false),
      StructField("count", LongType, false),
      StructField("nunique", LongType, false),
      StructField("nan_count", LongType, false),
      StructField("mean", DoubleType), StructField("std", DoubleType),
      StructField("min", DoubleType),
      StructField("first_quartile", DoubleType),
      StructField("second_quartile", DoubleType),
      StructField("third_quartile", DoubleType),
      StructField("max", DoubleType),
      StructField("num_true", LongType), StructField("num_false", LongType),
      StructField("mode", StringType),
      StructField("min_datetime", TimestampType),
      StructField("max_datetime", TimestampType),
      StructField("mean_datetime", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), outSchema)
  }

  /** First mode per column — ties break to the smallest value, matching
    * pandas' sorted `Series.mode()[0]` (reference:
    * statistics_utils/_get_mode.py:1-6). All columns in one melt job: values
    * are stacked as (column, value-as-string) pairs, counted, and ranked.
    */
  def modesFor(df: DataFrame, cols: Seq[String]): Map[String, String] =
    meltStats(df, cols)._1

  /** One melt job for per-column mode AND exact nunique: stack (column,
    * value-as-string) pairs, count groups, then take top-1 per column and
    * the per-column group count in the same aggregation. Value stringification
    * is injective for distinct atomic values, so group counts equal
    * count(DISTINCT col).
    */
  def meltStats(df: DataFrame,
                cols: Seq[String]): (Map[String, String], Map[String, Long]) = {
    if (cols.isEmpty) return (Map.empty, Map.empty)
    val entries = cols.map(n =>
      struct(lit(n).as("column_name"), col(n).cast(StringType).as("value")))
    val melted = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.value"))
      .where(col("value").isNotNull)
    val w = Window.partitionBy("column_name")
      .orderBy(col("cnt").desc, col("value").asc)
    val rows = melted.groupBy("column_name", "value").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .groupBy("column_name")
      .agg(max(when(col("rn") === 1, col("value"))).as("mode"),
        count(lit(1)).as("nunique"))
      .collect()
    (rows.map(r => r.getString(0) -> r.getString(1)).toMap,
      rows.map(r => r.getString(0) -> r.getLong(2)).toMap)
  }

  /** Equal-width histogram of a numeric column in `bins` buckets
    * (reference: statistics_utils/_get_histogram_values.py:4-37). Bounds come
    * from one agg; bucketing is a `width_bucket` groupBy — two scans total.
    */
  def histogram(df: DataFrame, colName: String, bins: Int = 10): DataFrame = {
    val c = col(colName).cast(DoubleType)
    val Row(lo: Double, hi: Double) = df.agg(min(c), max(c)).head()
    val hiAdj = if (hi == lo) lo + 1 else hi
    // explicit floor arithmetic (not width_bucket) so the exact same IEEE
    // expression is reproducible in any ANSI engine
    val bin = least(greatest(
      floor((c - lit(lo)) / (lit(hiAdj) - lit(lo)) * bins).cast(LongType) + 1L,
      lit(1L)), lit(bins.toLong))
    df.where(c.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("frequency"))
      .orderBy("bin")
  }

  /** Top-x most recent date counts for a datetime column
    * (reference: statistics_utils/_get_recent_value_counts.py:1-18).
    */
  def recentValueCounts(df: DataFrame, colName: String, x: Int = 10): DataFrame =
    df.where(col(colName).isNotNull)
      .groupBy(to_date(col(colName)).as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("value").desc)
      .limit(x)
      .orderBy(col("count").desc, col("value").asc)

  /** Counts for every integer in [min,max] when the range is small enough
    * (reference: statistics_utils/_get_numeric_value_counts_in_range.py:4-23).
    */
  def numericValueCountsInRange(df: DataFrame, colName: String, bins: Int = 10): DataFrame = {
    val c = col(colName)
    df.where(c.isNotNull)
      .groupBy(c.cast(LongType).as("value"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("value").asc)
      .limit(bins)
  }
}
