package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-sequence analytics over an (actor, timestamp, event-type) log —
  * the product-analytics pair every training-data/event pipeline ends up
  * re-implementing: ordered-funnel conversion and cohort retention. Both
  * are EXACT (no sessionization sampling, no sketch), both reduce the log
  * to actor-keyed aggregates before anything else moves, and both emit
  * counts as exact Longs with one final double division per ratio (the
  * repo-wide bit-exact oracle convention).
  *
  * Reference: the funnel semantics are the standard nested-min form
  * (step i is the EARLIEST event of type iₜₕ strictly after the step
  * i−1 time — the greedy-earliest match over the time-sorted stream,
  * which is equivalent and is how [[funnel]] computes it in one pass).
  */
object EventAnalytics {

  /** Ordered funnel: how many actors complete each prefix of `steps` in
    * time order? An actor reaches step i when an event of type
    * `steps(i)` exists STRICTLY after its step-(i−1) time (step 0 = the
    * actor's earliest `steps(0)` event); ties at the same timestamp do
    * not advance, and rows with a null actor/ts/type are ignored.
    * Greedy-earliest over the sorted stream equals the nested-min
    * definition: taking the earliest qualifying event at every step
    * only ever leaves MORE room for later steps.
    *
    * Scale shape: events prune to the step types at the scan, then ONE
    * shuffle groups (ts, type) pairs by actor — the minimum any exact
    * funnel can move — and the per-actor fold runs as an `aggregate`
    * higher-order function over the actor's sorted events (per-row work
    * is |actor events| comparisons on scalars, not the q136 heavy-text
    * HOF case). The per-step counts are one more aggregation over the
    * actor-level frame. Driver state is step-count-sized.
    *
    * Output: one row per step — (step_index 1-based, step, n_actors,
    * conversion = this step's actors over the PREVIOUS step's as a raw
    * double quotient of exact Longs — 1.0 at step 1 —, overall = this
    * step's actors over the FIRST step's). A zero denominator reads
    * 0.0, and every step is emitted even when empty.
    */
  def funnel(df: DataFrame, actorCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size,
      "duplicate funnel step: repeated types make the greedy match " +
        "ambiguous with the nested-min definition")
    Seq(actorCol, tsCol, typeCol).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    val k = steps.size
    val evs = df
      .where(col(actorCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(steps: _*))
      .groupBy(col(actorCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(typeCol).as("y")))).as("__evs"))
    val stepArr = array(steps.map(lit): _*)
    val tsType = df.schema(tsCol).dataType
    val zero: Column = struct(
      lit(0).as("r"), lit(null).cast(tsType).as("last"))
    val reached = evs.select(
      aggregate(col("__evs"), zero, (acc, e) =>
        when(acc("r") < k &&
            e("y") === element_at(stepArr, acc("r") + 1) &&
            (acc("r") === 0 || e("t") > acc("last")),
          struct((acc("r") + 1).as("r"), e("t").as("last")))
          .otherwise(acc))("r").as("__r"))
    // one tiny aggregation: actors reaching AT LEAST step i, for all i
    val aggs = (1 to k).map(i =>
      count(when(col("__r") >= i, 1)).as(s"__s$i"))
    val row = reached.agg(aggs.head, aggs.tail: _*).head()
    val counts = (0 until k).map(row.getLong)
    val spark = df.sparkSession
    val rows = steps.zipWithIndex.map { case (s, i) =>
      val n = counts(i)
      val prev = if (i == 0) n else counts(i - 1)
      val first = counts(0)
      Row(i + 1, s, n,
        if (prev == 0L) 0.0 else n.toDouble / prev,
        if (first == 0L) 0.0 else n.toDouble / first)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("step_index", IntegerType, nullable = false),
        StructField("step", StringType, nullable = false),
        StructField("n_actors", LongType, nullable = false),
        StructField("conversion", DoubleType, nullable = false),
        StructField("overall", DoubleType, nullable = false))))
  }

  /** Cohort retention: actors bucketed by the period of their FIRST
    * event, and for each (cohort, period-offset) cell the count of
    * cohort actors active in that offset period. Periods are pure
    * day-arithmetic buckets of `periodDays` anchored at 1970-01-01
    * (`floor(days-since-epoch / periodDays)`) — no calendar week
    * convention to disagree on across engines — and the offset is
    * `cohort-relative`: `floor(datediff(event, first_event) /
    * periodDays)`, so offset 0 always exists for a non-empty cohort.
    * Rows with a null actor or ts are ignored.
    *
    * Scale shape: one actor-keyed aggregation finds first events
    * (shuffle ≤ actors); events join that frame on the actor (AQE
    * broadcasts the per-actor side when it fits, else a co-keyed
    * shuffle), collapse to distinct (cohort, offset, actor) cells
    * map-side, and the cell counts + cohort sizes are two more bounded
    * aggregations. Nothing row-scale moves after the first shuffle.
    *
    * Output: (cohort_period — the anchored bucket index of the cohort's
    * first-event day, week-like when periodDays = 7 —, period_offset,
    * n_active, cohort_size, retention = n_active/cohort_size as the raw
    * double quotient of exact Longs), ordered by (cohort_period,
    * period_offset).
    */
  def cohortRetention(df: DataFrame, actorCol: String, tsCol: String,
                      periodDays: Int = 7): DataFrame = {
    require(periodDays > 0, s"need periodDays > 0, got $periodDays")
    Seq(actorCol, tsCol).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    val base = df
      .where(col(actorCol).isNotNull && col(tsCol).isNotNull)
      .select(col(actorCol).as("__a"), to_date(col(tsCol)).as("__d"))
    val firsts = base.groupBy(col("__a"))
      .agg(min(col("__d")).as("__first"))
      .withColumn("__cohort",
        floor(datediff(col("__first"), lit("1970-01-01").cast("date"))
          / periodDays))
    val cells = base.join(firsts, "__a")
      .select(col("__cohort"),
        floor(datediff(col("__d"), col("__first")) / periodDays)
          .as("period_offset"),
        col("__a"))
      .distinct()
      .groupBy(col("__cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("__cohort"))
      .select(
        col("__cohort").as("cohort_period"),
        col("period_offset"),
        col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }
}
