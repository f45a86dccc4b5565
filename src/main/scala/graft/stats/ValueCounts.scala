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

  /** PER-GROUP top-k values (r13): for each group of `groupCols`, the
    * `k` most frequent values of `valueCol` with exact counts and the
    * share of the group's NON-NULL values — "top domains per source",
    * the grouped companion to [[topValues]]. Null values are excluded
    * (the [[topValues]] convention); rank order is (count desc, value
    * asc) — deterministic, no tie ambiguity.
    *
    * Scale shape: one map-side-combined aggregation collapses to
    * per-(group, value) counts (shuffle ≤ distinct pairs); the rank and
    * the share denominator ride per-group windows over that COLLAPSED
    * frame (partition = the group's distinct values, never its rows —
    * the collapse-before-sort contract), and the top-k filter is a
    * projection.
    *
    * Output: (groupCols..., value — string cast —, n, share, rank),
    * rank 1..k per group, ordered by (groupCols..., rank).
    */
  def topValuesByGroup(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, k: Int = 10): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(k > 0, s"need k > 0, got $k")
    (groupCols :+ valueCol).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    require(!groupCols.contains(valueCol),
      s"value column '$valueCol' is also a group column")
    Seq("value", "n", "share", "rank").foreach(o =>
      require(!groupCols.contains(o),
        s"group column '$o' collides with an output column"))
    val gs = groupCols.map(col)
    val counts = df
      .where(col(valueCol).isNotNull)
      .groupBy(gs :+ col(valueCol).cast("string").as("value"): _*)
      .agg(count(lit(1)).as("n"))
    rankValueCounts(counts, groupCols, k)
  }

  /** Rank a PRE-COLLAPSED (groupCols..., value, n) counts frame into the
    * [[topValuesByGroup]] output — the shared final stage between the
    * batch op and the closed-window output of
    * [[graft.streaming.StreamingFrame.streamingTopValues]] (one rank
    * implementation, so the replay ≡ batch pin compares like with
    * like). Windows run over the collapsed frame only (partition = a
    * group's distinct values), the collapse-before-sort contract.
    *
    * THE INPUT MUST BE COLLAPSED: exactly one row per (groupCols...,
    * value). The canonical misuse is SILENT, not loud — ranking
    * [[graft.streaming.StreamingFrame.streamingTopValues]] emissions
    * WITHOUT `window_start` in `groupCols` leaves one row per (window,
    * group, value) under a (group, value) key, so the same value ranks
    * several times, counts split across duplicate ranked rows, and
    * every share uses a summed-across-windows denominator — plausible
    * numbers, all wrong. Always rank with the window key:
    * `rankValueCounts(emitted, "window_start" +: groupCols, k)`.
    * `checkCollapsed = true` adds an in-plan duplicate guard (one extra
    * window pass over the collapsed frame) that fails loudly on the
    * first duplicate instead — the spec/debug arm; production callers
    * that already collapsed (a groupBy output) skip the cost.
    */
  def rankValueCounts(counts: DataFrame, groupCols: Seq[String],
                      k: Int, checkCollapsed: Boolean = false)
      : DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(k > 0, s"need k > 0, got $k")
    (groupCols ++ Seq("value", "n")).foreach(c =>
      require(counts.columns.contains(c), s"column '$c' not in frame"))
    // same loud-misuse guard as topValuesByGroup: a group column named
    // rank/share would be silently REPLACED by the withColumns below
    // (and value/n would make the input references ambiguous)
    Seq("value", "n", "share", "rank").foreach(o =>
      require(!groupCols.contains(o),
        s"group column '$o' collides with an output column"))
    val gs = groupCols.map(col)
    val wRank = Window.partitionBy(gs: _*)
      .orderBy(col("n").desc, col("value").asc)
    val wAll = Window.partitionBy(gs: _*)
    // loud duplicate guard (checkCollapsed): >1 row under one (group,
    // value) key means the input was never collapsed (see scaladoc) —
    // fail on the offending value rather than emit plausible wrong
    // ranks. The guard RIDES the rank expression (always +0, or throws):
    // a standalone dropped column would be pruned out of the plan and
    // the check would silently never run.
    val guard =
      if (!checkCollapsed) lit(0)
      else {
        val dups = count(lit(1))
          .over(Window.partitionBy(gs :+ col("value"): _*))
        // cast: concat would fail ANALYSIS for a non-string value
        // column under ANSI, killing the query before the intended
        // diagnostic could ever fire (r15 ADVICE)
        when(dups > 1, raise_error(concat(
          lit("rankValueCounts: duplicate rows under one (group, " +
            "value) key — input is not pre-collapsed (ranking " +
            "without the window key?): value="),
          col("value").cast("string")))
          .cast("int")).otherwise(lit(0))
      }
    counts
      .withColumn("rank", row_number().over(wRank) + guard)
      .withColumn("share", col("n").cast("double") /
        sum(col("n")).over(wAll).cast("double"))
      .where(col("rank") <= k)
      .select(gs ++ Seq(col("value"), col("n"), col("share"),
        col("rank")): _*)
      .orderBy(groupCols.map(c => col(c).asc_nulls_last) :+
        col("rank").asc: _*)
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
