package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based event sessionization: a new session starts when the time since
  * the same key's previous event exceeds the gap. The batch analog of
  * Structured Streaming's session windows, and the standard first step of
  * clickstream / user-activity feature pipelines.
  *
  * Scale shape — SKEW-SPLIT (r15, the [[EventAnalytics]] successor-family
  * posture): an eager bounded per-key count ([[HeavySplit]]) routes each
  * key to one of two exact paths. LIGHT keys (the overwhelming majority)
  * keep the one-shuffle whole-key window — the lag and the running sum
  * share one (key × time-order) window spec, riding the SAME
  * exchange/sort, with task size bounded by the threshold itself. HEAVY
  * keys (a 10⁹-event bot at 100 TB would otherwise sort its entire
  * history in ONE task) split by (key, time-segment): session starts are
  * segment-LOCAL except each segment's first event, whose gap check needs
  * only the previous occupied segment's LAST timestamp — one scalar — and
  * the global session index is the segment-local running count plus a
  * per-segment base from a prefix sum over segment-count-sized (first,
  * last, local-start-count) state. Segment boundaries strictly separate
  * timestamps (bucket = `t − pmod(t, width)`, exact Long arithmetic), so
  * concatenating segments in order IS the key's time order and the merge
  * algebra is exact at any width (spec-pinned across widths and regimes).
  *
  * Heavy-path shuffle budget (plan-pinned): because the output carries
  * EVERY input column, the per-segment state cannot ride the wide window
  * exchange (column pruning narrows its branch below reuse), so heavy
  * rows pay one wide (key, segment) shuffle for the window plus one
  * NARROW (key, segment, µs, tiebreak) shuffle for the state — a few
  * percent of row volume — then bounded segment-count-scale exchanges
  * for the merge. Light keys pay exactly the pre-r15 single shuffle.
  */
object Sessionize {

  /** Add `session_index` (0-based per key, time-ordered) to an event frame.
    * `orderCols` break timestamp ties deterministically (session membership
    * is tie-order-independent — equal timestamps always land in the same
    * session — but a stable order keeps downstream row output reproducible).
    *
    * Null handling (both paths, identical): a NULL key is a real group; a
    * NULL timestamp orders FIRST (Spark's asc default) and starts its own
    * session — the null-vs-anything gap comparison never reads "within
    * gap", so null-stamped rows are one-event sessions ahead of the real
    * ones, never silently merged into them.
    *
    * `split` is the heavy-key routing policy — [[HeavySplit.Detect]]
    * (default) runs the eager bounded pre-count at call time (the
    * [[SkewJoin.joinCardinality]] contract; the same job reads heavy-key
    * spans, so `segmentSeconds = 0` AUTO-derives the width and an
    * explicitly tiny width is clamped to a bounded per-key segment
    * count); [[HeavySplit.AssumeLight]] keeps the call fully lazy;
    * [[HeavySplit.Known]] reuses one precomputed [[HeavySplit.detect]]
    * across several calls. Routing never changes results — only which
    * plan computes them.
    */
  def withSessions(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long,
                   orderCols: Seq[String] = Seq.empty,
                   segmentSeconds: Long = 86400L,
                   segmentThreshold: Long =
                     EventAnalytics.DefaultSegmentThreshold,
                   split: HeavySplit = HeavySplit.Detect): DataFrame =
    branches(df, keyCol, tsCol, gapSeconds, orderCols, segmentSeconds,
        segmentThreshold, split)
      .map { case (b, segOpt) => segOpt.fold(b)(b.drop(_)) }
      .reduce(_ unionAll _)

  /** The split's per-routing-path frames, each carrying `session_index`
    * — the heavy frame still holds its segment column (named in the
    * Option) so [[sessionStats]] can aggregate per branch BELOW the
    * union on each branch's existing partitioning (a union output has
    * no partitioning, so aggregating above it would re-shuffle every
    * row — the light path's one-exchange plan pin would silently
    * regress to two).
    */
  private def branches(df: DataFrame, keyCol: String, tsCol: String,
                       gapSeconds: Long, orderCols: Seq[String],
                       segmentSeconds: Long, segmentThreshold: Long,
                       split: HeavySplit)
      : Seq[(DataFrame, Option[String])] = {
    // the upper bound keeps gapMicros (and the merge's f − l comparison)
    // wrap-free — the topEventPaths maxGapSeconds rationale
    require(gapSeconds > 0 && gapSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need 0 < gapSeconds <= ${EventAnalytics.MaxWindowSeconds}, " +
        s"got $gapSeconds")
    require(segmentSeconds >= 0 &&
      segmentSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need 0 <= segmentSeconds <= ${EventAnalytics.MaxWindowSeconds} " +
        s"(0 = auto), got $segmentSeconds")
    require(segmentThreshold > 0,
      s"need segmentThreshold > 0, got $segmentThreshold")
    (Seq(keyCol, tsCol) ++ orderCols).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    require(!df.columns.contains("session_index"),
      "input already has a 'session_index' column")
    // cast first: parquet TIMESTAMP_NTZ columns (isAdjustedToUTC=false)
    // are rejected by unix_micros; the session timezone is UTC so the
    // cast is a deterministic reinterpretation
    val us = unix_micros(col(tsCol).cast(TimestampType))
    val gapMicros = gapSeconds * 1000000L // bounded by the require
    val order = us.asc +: orderCols.map(col(_).asc)

    // LIGHT path — the pre-r15 one-exchange shape, task ≤ threshold rows
    def lightSessions(src: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      val prev = lag(us, 1).over(w)
      val isNew = when(prev.isNull || us - prev > gapMicros, 1)
        .otherwise(0)
      val runningTotal = sum(isNew)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      src.withColumn("session_index", (runningTotal - 1).cast(LongType))
    }

    val routing = HeavySplit.resolve(split, df, col(keyCol), us,
      segmentThreshold)
    if (!HeavySplit.hasHeavy(routing))
      return Seq(lightSessions(df) -> None)

    val isHeavy = HeavySplit.isHeavy(col(keyCol), routing)
    val segMicros = HeavySplit.effectiveSegmentMicros(df, isHeavy, us,
      segmentSeconds, routing)

    // HEAVY path: (key, segment) windows + a per-key prefix-sum merge
    // over (first, last, local-start-count) segment state; returns the
    // frame (segment column RETAINED) and the segment column's name
    def heavySessions(src: DataFrame): (DataFrame, String) = {
      // fresh internal names ([[HeavySplit.freshNames]]): the output must
      // carry EVERY input column, so the full-re-projection convention
      // does not apply — generated names that provably miss the input
      // columns close the collision class instead
      val Seq(segN, runN, segsN, mN, fN, lN, cN, kJ, sJ, bJ, cJ) =
        HeavySplit.freshNames(df.columns.toSeq :+ "session_index")(
          "__seg", "__run", "__segs", "__m", "__f", "__l", "__c",
          "__mk", "__ms", "__mb", "__mc")
      // segment id = segment-START micros (exact Long floor arithmetic,
      // correct for pre-1970 micros); a NULL timestamp lands in a
      // sentinel segment that sorts FIRST — matching the light path's
      // nulls-first order — and Long.MinValue can never collide with a
      // real start (|t| < 2.6e17)
      val seg = coalesce(us - pmod(us, lit(segMicros)), lit(Long.MinValue))
      val withSeg = src.withColumn(segN, seg)
      val w = Window.partitionBy(col(keyCol), col(segN)).orderBy(order: _*)
      val prev = lag(us, 1).over(w)
      val isNewLocal = when(prev.isNull || us - prev > gapMicros, 1)
        .otherwise(0)
      // the local running start-count; the per-segment state aggregation
      // below groups on the same (key, segment) keys, so both read ONE
      // exchange (ReuseExchange, plan-pinned)
      val rows = withSeg.withColumn(runN, sum(isNewLocal)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val segState = rows
        .groupBy(col(keyCol), col(segN))
        .agg(min(us).as(fN), max(us).as(lN), max(col(runN)).as(cN))
      // per-key merge in segment order: cont(j) = does segment j's first
      // event continue the previous occupied segment's last session
      // (f − l <= gap; null-safe false — a null-stamped segment neither
      // continues nor is continued, the light path's null semantics);
      // base(j) = prefix sum of true start counts (local count minus the
      // continuation correction). Both are LINEAR segment-scale windows
      // over the segState frame — lag for the previous occupied
      // segment's last event, a grow-only prefix sum for the base —
      // replacing the collect_list + higher-order fold whose
      // array-concat accumulation was QUADRATIC in a key's occupied
      // segments (r16 measurement on the asof twin of this fold: ~3 s
      // per heavy pass at the 4096-segment clamp, window form
      // segment-scale). The two windows share one spec, so the frame
      // sorts once.
      val wSeg = Window.partitionBy(col(keyCol)).orderBy(col(segN))
      val cont = coalesce(
        col(fN) - lag(col(lN), 1).over(wSeg) <= lit(gapMicros),
        lit(false))
      val wPre = wSeg.rowsBetween(Window.unboundedPreceding, -1)
      val merged = segState
        .withColumn(cJ, cont)
        .select(col(keyCol).as(kJ), col(segN).as(sJ),
          coalesce(sum(col(cN) - when(col(cJ), 1L).otherwise(0L))
            .over(wPre), lit(0L)).as(bJ),
          col(cJ))
      // rows rejoin their segment's (base, cont) on (key, segment) —
      // key equality NULL-SAFE (a null key is a real group; plain
      // EqualTo would never match it, the groupedQuantiles hazard class)
      val idx = (col(runN) - when(col(cJ), 1L).otherwise(0L) +
        col(bJ) - 1L).cast(LongType)
      // when the routing proves the state side small (enumerated heavy
      // keys × bounded segments), broadcast it: the row-scale side then
      // needs no join shuffle/sort at all (its window order/partitioning
      // would otherwise feed a sort-merge join re-sort)
      val stateSide = HeavySplit.maybeBroadcastState(merged, routing,
        segMicros)
      val out = rows
        .join(stateSide, col(keyCol) <=> col(kJ) && col(segN) === col(sJ))
        .withColumn("session_index", idx)
        .select(df.columns.map(col) :+ col("session_index") :+
          col(segN): _*)
      (out, segN)
    }

    if (routing.allHeavy) {
      val (h, segN) = heavySessions(df)
      Seq(h -> Some(segN))
    } else {
      val (h, segN) = heavySessions(df.where(isHeavy))
      Seq(lightSessions(df.where(!isHeavy)) -> None, h -> Some(segN))
    }
  }

  /** Per-session summary: event count, first/last event time (epoch micros,
    * exact on any engine) and duration. Same skew posture and routing
    * knobs as [[withSessions]]; the per-session aggregation's grouping
    * key starts with the key column, so the light path's hash
    * partitioning already co-locates it (no second exchange).
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long,
                   orderCols: Seq[String] = Seq.empty,
                   segmentSeconds: Long = 86400L,
                   segmentThreshold: Long =
                     EventAnalytics.DefaultSegmentThreshold,
                   split: HeavySplit = HeavySplit.Detect): DataFrame = {
    require(!Seq("n_events", "start_us", "end_us", "duration_us")
      .contains(keyCol),
      s"key column '$keyCol' collides with a session-stats output column")
    val us = unix_micros(col(tsCol).cast(TimestampType))
    branches(df, keyCol, tsCol, gapSeconds, orderCols, segmentSeconds,
        segmentThreshold, split)
      .map {
        case (b, None) =>
          // rides the light window's (key) hash partitioning: grouping
          // on (key, index) is clustered by the key alone — no exchange
          b.groupBy(col(keyCol), col("session_index"))
            .agg(count(lit(1)).as("n_events"), min(us).as("start_us"),
              max(us).as("end_us"))
        case (b, Some(segN)) =>
          // heavy rows are (key, segment)-partitioned and sessions cross
          // segments: collapse to (key, segment, index) cells first (no
          // exchange, map-side), then combine the CELL-scale frame on
          // (key, index) — the only heavy-branch exchange is cell-sized.
          // Partial-cell aliases dodge keyCol/segN (the groupBy output's
          // only surviving input names; keyCol is require-gated against
          // the output names, segN generated fresh).
          val Seq(pn, pmn, pmx) = HeavySplit.freshNames(
            Seq(keyCol, segN))("__pn", "__pmn", "__pmx")
          b.groupBy(col(keyCol), col(segN), col("session_index"))
            .agg(count(lit(1)).as(pn), min(us).as(pmn),
              max(us).as(pmx))
            .groupBy(col(keyCol), col("session_index"))
            .agg(sum(col(pn)).as("n_events"),
              min(col(pmn)).as("start_us"),
              max(col(pmx)).as("end_us"))
      }
      .reduce(_ unionAll _)
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
