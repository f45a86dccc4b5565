package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * pandas `merge_asof` parity knobs (r16):
    *   - `direction = "forward"` matches the EARLIEST right row at or
    *     after (strict: after) the left time — implemented as the
    *     backward join over REFLECTED time (`timestamp_micros(−µs)`;
    *     numeric columns negate), so both directions share one code
    *     path, one skew posture, and one set of tie/null conventions
    *     (a reflection is order-reversing and bijective on µs).
    *     Requires time-typed or numeric time columns.
    *   - `direction = "nearest"` picks the closer of the backward and
    *     forward matches (absolute distance; ties go BACKWARD, the
    *     pandas convention) — two match passes (so two pre-scans under
    *     `Detect` and ~2× the single-direction cost) with the pick as a
    *     pure projection; the tolerance restricts the candidate set
    *     BEFORE the pick, so "nearest within tolerance" is exact.
    *   - `toleranceSeconds > 0` null-s out a match farther than the
    *     tolerance from the probe (no fallback to older rows — any
    *     earlier/later row is farther still, the pandas semantics).
    *     The matched right time rides the payload struct internally; the
    *     filter is a pure post-projection, identical on both routing
    *     paths. Requires time-typed columns (seconds need a clock).
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               rightValues: Seq[String], strict: Boolean = false,
               suffix: String = "_right",
               direction: String = "backward",
               toleranceSeconds: Long = 0L,
               segmentSeconds: Long = 86400L,
               segmentThreshold: Long =
                 EventAnalytics.DefaultSegmentThreshold,
               split: HeavySplit = HeavySplit.Detect): DataFrame = {
    require(on.nonEmpty, "asofJoin requires at least one key column")
    require(rightValues.nonEmpty,
      "asofJoin requires at least one right value column")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', " +
        s"got '$direction'")
    require(toleranceSeconds >= 0 &&
      toleranceSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need 0 <= toleranceSeconds <= ${EventAnalytics.MaxWindowSeconds} " +
        s"(0 = unbounded), got $toleranceSeconds")
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
    def isTime(dt: DataType): Boolean = dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
    val ltT = left.schema(left.schema.fieldIndex(leftTime)).dataType
    val rtT = right.schema(right.schema.fieldIndex(rightTime)).dataType
    val timeTyped = isTime(ltT) && isTime(rtT)
    val numericTimes =
      ltT.isInstanceOf[NumericType] && rtT.isInstanceOf[NumericType]
    require(toleranceSeconds == 0 || timeTyped,
      "toleranceSeconds requires timestamp/date time columns")
    require(direction == "backward" || timeTyped || numericTimes,
      s"direction='$direction' requires timestamp/date or numeric time " +
        "columns (reflection/distance need arithmetic)")
    // TIMESTAMP_NTZ/DATE route through a session-timezone cast for the
    // reflection and gap arithmetic; under a DST-shifting zone two
    // naive times can collapse (spring-forward gap) or a gap can read
    // an hour off — so the knobs that do CLOCK ARITHMETIC require a
    // fixed-offset session timezone. The backward default sorts the
    // raw column and is immune.
    def zoneSensitive(dt: DataType): Boolean =
      dt == TimestampNTZType || dt == DateType
    if ((direction != "backward" || toleranceSeconds > 0) &&
        (zoneSensitive(ltT) || zoneSensitive(rtT))) {
      val tz = left.sparkSession.conf.get(
        "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
      require(java.time.ZoneId.of(tz).getRules.isFixedOffset,
        s"direction='$direction'/toleranceSeconds over TIMESTAMP_NTZ/" +
          s"DATE columns require a fixed-offset session timezone, got " +
          s"'$tz' — naive times would shift through DST in the cast; " +
          "cast to TIMESTAMP explicitly or set a fixed-offset zone")
    }
    val tolUs = Math.multiplyExact(toleranceSeconds, 1000000L)
    // the comparable CLOCK of a time value (micros for time types, the
    // raw value for numeric sequences) — gap/distance arithmetic
    def clockOf(c: Column): Column =
      if (timeTyped) unix_micros(c.cast(TimestampType)) else c
    // at equal times the side that sorts FIRST is the one whose value the
    // other may see: right first (inclusive ties, `>=`) unless strict
    val leftSide = if (strict) 0 else 1
    val routeKey =
      if (on.size == 1) col(on.head) else xxhash64(on.map(col): _*)

    /** One directional match pass: `base` (a left-shaped frame carrying
      * any columns) gains `rvName` — the matched right payload struct
      * for this direction, with the matched right clock as field
      * `rtField` when `carryRt`. Forward runs the backward machinery
      * over REFLECTED time.
      */
    def matchSide(base: DataFrame, fwd: Boolean, rvName: String,
                  rtField: String, carryRt: Boolean): DataFrame = {
      val Seq(tN, sN) = HeavySplit.freshNames(
        (base.columns ++ right.columns).toSeq :+ rvName)("__t", "__side")
      def scanT(c: Column): Column =
        if (!fwd) c
        else if (timeTyped)
          timestamp_micros(-unix_micros(c.cast(TimestampType)))
        else negate(c)
      val l = base
        .withColumn(tN, scanT(col(leftTime)))
        .withColumn(sN, lit(leftSide))
      val rvFields = rightValues.map(col) ++
        (if (carryRt) Seq(clockOf(col(rightTime)).as(rtField)) else Nil)
      val r = right
        .where(on.map(col(_).isNotNull).reduce(_ && _) &&
          col(rightTime).isNotNull)
        .select(on.map(col) ++ Seq(scanT(col(rightTime)).as(tN),
          lit(1 - leftSide).as(sN),
          struct(rvFields: _*).as(rvName)): _*)
      val u = l.unionByName(r, allowMissingColumns = true)
      val scanTimeTyped = u.schema(u.schema.fieldIndex(tN)).dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      val splittable = scanTimeTyped &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
          u.schema(u.schema.fieldIndex(rvName)).dataType)
      val filled = TimeSeries.fillSegments(u, on, routeKey, tN,
        Seq(rvName), orderCols = Seq(sN), nullsLast = false,
        segmentSeconds, segmentThreshold,
        if (splittable) split else HeavySplit.AssumeLight)
      filled.where(col(sN) === leftSide).drop(tN, sN)
    }

    val Seq(rvN, rvFN, rtN) = HeavySplit.freshNames(
      (left.columns ++ right.columns).toSeq ++ rightValues)(
      "__rv", "__rvf", "__rt")
    val lClock = clockOf(col(leftTime))
    val (matched, rv) =
      if (direction == "nearest") {
        // both directional matches (each carrying its clock), then pick
        // the closer; ties go BACKWARD (the pandas convention), and the
        // tolerance restricts the candidate set BEFORE the pick
        val both = matchSide(matchSide(left, fwd = false, rvN, rtN,
          carryRt = true), fwd = true, rvFN, rtN, carryRt = true)
        val bGap = lClock - col(rvN).getField(rtN)
        val fGap = col(rvFN).getField(rtN) - lClock
        val bOk = col(rvN).isNotNull &&
          (if (tolUs == 0L) lit(true) else bGap <= tolUs)
        val fOk = col(rvFN).isNotNull &&
          (if (tolUs == 0L) lit(true) else fGap <= tolUs)
        (both, when(bOk && (!fOk || bGap <= fGap), col(rvN))
          .when(fOk, col(rvFN)))
      } else {
        val fwd = direction == "forward"
        val m = matchSide(left, fwd, rvN, rtN, carryRt = tolUs > 0)
        val rv =
          if (tolUs == 0L) col(rvN)
          else {
            val gap =
              if (fwd) col(rvN).getField(rtN) - lClock
              else lClock - col(rvN).getField(rtN)
            when(gap <= tolUs, col(rvN))
          }
        (m, rv)
      }
    // materialize the pick ONCE: the nearest/tolerance when-chain would
    // otherwise be re-embedded per extracted column
    val pickN = HeavySplit.freshNames(matched.columns.toSeq)("__pick").head
    val withPick = matched.withColumn(pickN, rv)
    rightValues.foldLeft(withPick) { (d, c) =>
      d.withColumn(c + suffix, col(pickN).getField(c))
    }.drop(pickN, rvN, rvFN)
  }
}
