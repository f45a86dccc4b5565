package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-time (as-of) join: each left row picks the most recent right row
  * with the same key and right time ≤ left time — the state-at-event-time
  * operator behind feature lookups, slowly-changing-dimension reads, and
  * trade/quote alignment. Spark has no built-in; the naive range join is a
  * per-key cross product.
  *
  * Implementation is the union-sort trick: tag both sides, union, and take a
  * running `last(right_payload, ignoreNulls)` over a (key)-partitioned
  * window ordered by (time, side) — right rows sort before left rows at
  * equal times, so ties match inclusively (DuckDB ASOF `>=` semantics;
  * `strict = true` flips the tie order for `>`). That running last IS a
  * forward fill of the right payload over the union, so the operator rides
  * [[TimeSeries.fillSegments]] — the r15 skew-split fill core: LIGHT keys
  * keep the one-shuffle whole-key window, while a HEAVY key (one hot
  * instrument/entity whose two-sided history would otherwise sort in a
  * single task) splits by (key, time-segment) with a cell-scale
  * map-side-combinable per-segment state, a prefix-fold carry, and a
  * broadcast rejoin when the routing proves the state side small. Null
  * left times order FIRST (nulls-first: a timeless probe precedes all
  * history and matches nothing) — the opposite convention from
  * [[TimeSeries.forwardFill]], carried through both paths by the core.
  * Scale shape: ONE shuffle on the key plus a task-bounded sort — no join
  * explosion, no per-row probe.
  */
object AsofJoin {

  /** Backward as-of join (the asof default). `on` columns must exist under
    * the same names on both sides; `rightValues` are the right-side columns
    * delivered to each left row (suffixed, null when no right row precedes).
    * Right rows with a null key or null time never match, mirroring SQL
    * equality-join null semantics.
    *
    * Skew knobs (r16, the [[TimeSeries.forwardFill]] posture):
    * `split = Detect` (default) runs one eager bounded per-key count and
    * routes only keys above `segmentThreshold` rows to the segmented
    * machinery; `AssumeLight`/`Known` skip or share the pre-scan
    * ([[HeavySplit]]). Composite keys route by `xxhash64` of the key tuple
    * — a hash collision only shifts a key between the two identical-result
    * paths (the window always partitions on the real key columns).
    * Non-time `leftTime` columns (any orderable type) keep the plain
    * whole-key window: the heavy path buckets by timestamp micros, so only
    * genuine time types can split (the forwardFill gate rationale —
    * routing must never change results).
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               rightValues: Seq[String], strict: Boolean = false,
               suffix: String = "_right",
               segmentSeconds: Long = 86400L,
               segmentThreshold: Long =
                 EventAnalytics.DefaultSegmentThreshold,
               split: HeavySplit = HeavySplit.Detect): DataFrame = {
    require(on.nonEmpty, "asofJoin requires at least one key column")
    require(rightValues.nonEmpty,
      "asofJoin requires at least one right value column")
    // the forwardFill contract on the identical knobs (0 = AUTO width)
    require(segmentSeconds >= 0 &&
      segmentSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need 0 <= segmentSeconds <= ${EventAnalytics.MaxWindowSeconds} " +
        s"(0 = auto), got $segmentSeconds")
    require(segmentThreshold > 0,
      s"need segmentThreshold > 0, got $segmentThreshold")
    on.foreach { c =>
      require(left.columns.contains(c), s"key column '$c' not on left")
      require(right.columns.contains(c), s"key column '$c' not on right")
    }
    require(left.columns.contains(leftTime),
      s"time column '$leftTime' not on left")
    require(right.columns.contains(rightTime),
      s"time column '$rightTime' not on right")
    rightValues.foreach(c => require(right.columns.contains(c),
      s"value column '$c' not on right"))
    // fresh internal names: the left frame may legitimately own __t etc.
    val Seq(tN, sN, rvN) = HeavySplit.freshNames(
      (left.columns ++ right.columns).toSeq)("__t", "__side", "__rv")
    // at equal times the side that sorts FIRST is the one whose value the
    // other may see: right first (inclusive ties, `>=`) unless strict
    val leftSide = if (strict) 0 else 1
    val l = left
      .withColumn(tN, col(leftTime))
      .withColumn(sN, lit(leftSide))
    val r = right
      .where(on.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(on.map(col) ++ Seq(col(rightTime).as(tN),
        lit(1 - leftSide).as(sN),
        struct(rightValues.map(col): _*).as(rvN)): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val timeTyped = u.schema(u.schema.fieldIndex(tN)).dataType match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    val splittable = timeTyped &&
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        u.schema(u.schema.fieldIndex(rvN)).dataType)
    val routeKey =
      if (on.size == 1) col(on.head) else xxhash64(on.map(col): _*)
    val filled = TimeSeries.fillSegments(u, on, routeKey, tN, Seq(rvN),
      orderCols = Seq(sN), nullsLast = false, segmentSeconds,
      segmentThreshold, if (splittable) split else HeavySplit.AssumeLight)
    val matched = filled.where(col(sN) === leftSide).drop(tN, sN)
    rightValues.foldLeft(matched) { (d, c) =>
      d.withColumn(c + suffix, col(rvN).getField(c))
    }.drop(rvN)
  }
}
