package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series feature operators over event streams: rolling-window
  * aggregates and fixed-interval resampling — the feature-engineering
  * layer the reference's time_index world points at but never implements
  * (woodwork stops at frequency inference; SURVEY §2.5).
  *
  * Money/metric sums use integer cents so every aggregate is
  * order-independent and hash-exact across engines. Windows are
  * per-key RANGE frames over epoch seconds — the shuffle key is the
  * entity, never a global order, so the plan scales with key cardinality
  * and the largest single entity's history bounds a task (external sort,
  * spills — same skew posture as sessionize).
  */
object TimeSeries {

  /** Rolling trailing-window aggregate per key: for every event, the
    * count and integer-cent sum of `valueCol` over [ts − window, ts]
    * (inclusive both ends, RANGE semantics: equal timestamps are peers).
    *
    * Computed as the DIFFERENCE OF TWO GROW-ONLY CUMULATIVE FRAMES —
    * `cum(≤ t) − cum(< t − window)` — never as a sliding frame: Spark
    * re-evaluates a sliding frame's aggregate from scratch at every row
    * (removal has no retraction path), so a sliding RANGE frame costs
    * O(rows × rows-in-frame) per key — measured 56× on a 30× replica
    * whose hot actor holds 20% of events (BENCH_SF1 §r15), where the
    * two grow-only frames (incremental add-only evaluation) stay O(rows)
    * at ANY density. Both frames ride one window spec (one exchange,
    * one sort); integer-cent arithmetic keeps the subtraction exact.
    *
    * Skew posture (documented, measured): the remaining hot-key cost is
    * the whole-key SORT (one task per key, the pre-r15 sessionize
    * shape). The sessionize-style segment split does NOT transfer
    * cheaply here — the subtracted frame's lower edge `t − window`
    * lands in an ARBITRARY earlier segment, so the per-segment carry is
    * an as-of lookup into another segment's prefix sums, not a scalar —
    * and the measured whole-key sort penalty at 20%-one-actor zipf is
    * the ~2× class — 1.52 s vs 0.70 s at 30× (the frame fix removed
    * the 56×: 54.7 s → 1.52 s) — so the op keeps the whole-key window
    * and states the bound: a key's history must fit one task's
    * external sort.
    *
    * Output: input columns + n_window + sum_cents_window. A NULL
    * timestamp has no trailing window: both outputs read null for that
    * row (explicit — not the sliding frame's accidental null-peer-group
    * aggregate).
    */
  def rollingAggregate(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    // bound keeps the micros arithmetic wrap-free (the Sessionize gap
    // rationale)
    require(windowSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need windowSeconds <= ${EventAnalytics.MaxWindowSeconds}, " +
        s"got $windowSeconds")
    // epoch MICROS as the range key: sub-second timestamps align exactly
    // in any engine (integer arithmetic, no truncation ambiguity)
    // cast first: TIMESTAMP_NTZ inputs are rejected by unix_micros
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol).cast(TimestampType)))
    val upTo = w.rangeBetween(Window.unboundedPreceding, 0)
    // rows strictly BELOW t − window: upper bound −(window·10⁶ + 1) on
    // the integer-micros order key — exact at µs granularity, so
    // cum(≤t) − cum(<t−window) is precisely the inclusive [t−window, t]
    val before = w.rangeBetween(Window.unboundedPreceding,
      -windowSeconds * 1000000L - 1L)
    val cents = round(col(valueCol) * 100).cast(LongType)
    val us = unix_micros(col(tsCol).cast(TimestampType))
    // a frame holding NO non-null value must read a NULL sum (the plain
    // sliding frame's semantics) — the cum-diff alone would read 0 there
    // whenever earlier non-nulls cancel out
    val nonNullInFrame = count(cents).over(upTo) - count(cents).over(before)
    // a NULL timestamp has no trailing window — both outputs read null,
    // EXPLICITLY: under a sliding frame null-ordered rows accidentally
    // aggregated their null peer group, and under the cum-diff the
    // before-frame's null bound would misread them differently; neither
    // accident is a contract (spec-pinned)
    df.withColumn("n_window",
        when(us.isNull, lit(null).cast(LongType))
          .otherwise(count(lit(1)).over(upTo) -
            count(lit(1)).over(before)))
      .withColumn("sum_cents_window",
        when(us.isNull || nonNullInFrame === 0, lit(null).cast(LongType))
          .otherwise(coalesce(sum(cents).over(upTo), lit(0L)) -
            coalesce(sum(cents).over(before), lit(0L))))
  }

  /** The two-bucket decomposition's shared frame machinery
    * ([[rollingExtrema]], [[rollingAggregateBucketed]]): the union of
    * real rows with copies shifted forward by the window width, the
    * (key, bucket) windows in BOTH orders, and the internal column
    * names. `shiftFilter` restricts which rows get shifted copies (an
    * op only shifts rows that can contribute to its aggregates).
    * Both frames are (unboundedPreceding → currentRow) — the ONLY
    * frame shape Spark evaluates incrementally; an unboundedFollowing
    * bound re-aggregates per row (measured 65 s vs 2.5 s at 30× zipf,
    * BENCH_SF1 §r16.2).
    */
  private def twoBucketFrames(df: DataFrame, keyCol: String, tsCol: String,
                              wUs: Long, shiftFilter: Column)
      : (DataFrame, String, String,
         org.apache.spark.sql.expressions.WindowSpec,
         org.apache.spark.sql.expressions.WindowSpec) = {
    val Seq(shN, effN) = HeavySplit.freshNames(df.columns.toSeq)(
      "__sh", "__eff")
    val us = unix_micros(col(tsCol).cast(TimestampType))
    val real = df.withColumn(shN, lit(false)).withColumn(effN, us)
    val shifted = df.where(us.isNotNull && shiftFilter)
      .withColumn(shN, lit(true)).withColumn(effN, us + wUs)
    val u = real.unionAll(shifted)
    // bucket START (a Long) as the partition value — pmod keeps floor
    // semantics without ANSI's Long/Long double division
    val bucket = col(effN) - pmod(col(effN), lit(wUs))
    val asc = Window.partitionBy(col(keyCol), bucket)
      .orderBy(col(effN).asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(col(keyCol), bucket)
      .orderBy(col(effN).desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    (u, shN, effN, asc, desc)
  }

  /** [[rollingAggregate]]'s SKEW-FLAT twin: the identical output
    * contract (input columns + n_window + sum_cents_window, the same
    * inclusive [t − W, t] RANGE semantics, null-timestamp rows read
    * null outputs, a window with no non-null value reads a null sum —
    * parity spec-pinned and oracled against the same SQL) computed via
    * the [[rollingExtrema]] two-bucket decomposition instead of the
    * whole-key cum-diff window. The trade, measured at 30×
    * (BENCH_SF1 §r16.2): ~3× the cum-diff's uniform cost (2.89 s vs
    * 0.99 s — 2× rows through two in-partition sorts) for a FLAT skew
    * ratio (zipf 2.49 s, 0.86× — inverting under a hot key) where the
    * whole-key cum-diff reads 1.8× — pick this form when a single key
    * can dominate (the (key, bucket) partition bounds any task by ~2
    * windows' worth of one key's events); [[rollingAggregate]] when
    * keys are balanced and the lower constant matters.
    */
  def rollingAggregateBucketed(df: DataFrame, keyCol: String, tsCol: String,
                               valueCol: String,
                               windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    require(windowSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need windowSeconds <= ${EventAnalytics.MaxWindowSeconds}, " +
        s"got $windowSeconds")
    (Seq(keyCol, tsCol, valueCol)).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    Seq("n_window", "sum_cents_window").foreach(n =>
      require(!df.columns.contains(n),
        s"output column '$n' already in frame"))
    val wUs = Math.multiplyExact(windowSeconds, 1000000L)
    // every non-null-ts row shifts: the COUNT must see null-valued rows
    val (u, shN, effN, asc, desc) =
      twoBucketFrames(df, keyCol, tsCol, wUs, lit(true))
    val cents = round(col(valueCol) * 100).cast(LongType)
    val cReal = when(!col(shN), cents)
    val cShift = when(col(shN), cents)
    // a frame holding NO non-null value must read a NULL sum (the
    // rollingAggregate contract)
    val nonNullInFrame =
      count(cReal).over(asc) + count(cShift).over(desc)
    u.withColumn("n_window",
        when(col(effN).isNull, lit(null).cast(LongType))
          .otherwise(count(when(!col(shN), lit(1))).over(asc) +
            count(when(col(shN), lit(1))).over(desc)))
      .withColumn("sum_cents_window",
        when(col(effN).isNull || nonNullInFrame === 0,
          lit(null).cast(LongType))
          .otherwise(coalesce(sum(cReal).over(asc), lit(0L)) +
            coalesce(sum(cShift).over(desc), lit(0L))))
      .where(!col(shN))
      .drop(shN, effN)
  }

  /** Rolling trailing-window MIN/MAX per key — the aggregates
    * [[rollingAggregate]] cannot emit, because min/max have no
    * subtraction inverse so the cum-diff trick does not apply. Instead:
    * the classic TWO-LEVEL decomposition. Time splits into window-wide
    * buckets; a trailing window [t − W, t] (inclusive both ends, RANGE
    * semantics) spans exactly the prefix of t's own bucket and the
    * suffix of the previous one. The prefix is a grow-only frame over
    * the row's (key, bucket) partition; the suffix is read through
    * SHIFTED ROW COPIES — every row is also emitted at t + W, landing in
    * the NEXT bucket, where "previous-bucket rows with t' ≥ t − W" is
    * exactly the shifted rows at or above the current position — so
    * both parts are grow-only frames (one moving bound, incremental
    * O(rows) evaluation, never a sliding re-evaluation) riding ONE
    * (key, bucket) exchange and ONE sort. `greatest`/`least` skip the
    * null side, so a window whose halves are empty reads null exactly
    * like the plain sliding frame would.
    *
    * Scale shape: 2× the rows through one shuffle — and, unlike
    * [[rollingAggregate]]'s whole-key window, the partition key is
    * (key, bucket): a hot key's history splits across its time buckets,
    * so no task ever sorts more than ~2 windows' worth of one key's
    * events. A NULL timestamp has no trailing window: both outputs null
    * (the [[rollingAggregate]] convention); null-timestamp rows bucket
    * separately and can never pollute a real window.
    *
    * Output: input columns + min_window + max_window.
    */
  def rollingExtrema(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"need windowSeconds > 0, got $windowSeconds")
    require(windowSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need windowSeconds <= ${EventAnalytics.MaxWindowSeconds}, " +
        s"got $windowSeconds")
    (Seq(keyCol, tsCol, valueCol)).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    val outNames = Seq("min_window", "max_window")
    outNames.foreach(n => require(!df.columns.contains(n),
      s"output column '$n' already in frame"))
    val wUs = Math.multiplyExact(windowSeconds, 1000000L)
    // shifted copies only matter when they can contribute a value
    val (u, shN, effN, asc, desc) =
      twoBucketFrames(df, keyCol, tsCol, wUs, col(valueCol).isNotNull)
    // asc frame = real values with t' ≤ t (peers included); desc frame =
    // shifted values with t' + W ≥ t (peers included — the t' = t − W
    // boundary row is IN the window)
    val vReal = when(!col(shN), col(valueCol))
    val vShift = when(col(shN), col(valueCol))
    u.withColumn("min_window",
        when(col(effN).isNull, lit(null).cast(df.schema(
          df.schema.fieldIndex(valueCol)).dataType))
          .otherwise(least(min(vReal).over(asc),
            min(vShift).over(desc))))
      .withColumn("max_window",
        when(col(effN).isNull, lit(null).cast(df.schema(
          df.schema.fieldIndex(valueCol)).dataType))
          .otherwise(greatest(max(vReal).over(asc),
            max(vShift).over(desc))))
      .where(!col(shN))
      .drop(shN, effN)
  }

  /** Fixed-interval resample: per (group, truncated timestamp) bucket,
    * event count, integer-cent sum, and min/max value — the downsampling
    * step before charting or model features. `unit` is a date_trunc unit
    * ("hour", "day", ...). One shuffle on (group, bucket).
    *
    * Output: (group, bucket, n, sum_cents, min_value, max_value).
    */
  def resample(df: DataFrame, tsCol: String, unit: String,
               groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast(LongType)
    df.select(col(groupCol).as("group"),
        date_trunc(unit, col(tsCol)).as("bucket"),
        cents.as("cents"), col(valueCol).as("v"))
      .groupBy(col("group"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("v")).as("min_value"), max(col("v")).as("max_value"))
  }

  /** Aggregations [[resampleGrid]] accepts per value column — a closed
    * set so the SQL oracle form is always known. `avg` follows the
    * engine's float-sum semantics; for bit-exact cross-engine ratios
    * prefer sum + count and divide downstream (the repo's exact-quotient
    * convention).
    */
  val ResampleAggs: Set[String] = Set("sum", "avg", "min", "max", "count")

  /** Shared grid machinery: the epoch-anchored bucket expression, the
    * closed aggregate-column builder, and its validation — defined once
    * so [[resampleGrid]] and [[resampleGridByKey]] can never drift on
    * bucket convention or supported aggregates.
    */
  private def gridBucket(tsCol: String, everySeconds: Long): Column =
    floor(unix_seconds(col(tsCol).cast(TimestampType)) / everySeconds)
      .as("__b")

  private def validateGridAggs(df: DataFrame,
                               aggs: Seq[(String, String)]): Unit = {
    require(aggs.distinct.size == aggs.size,
      "duplicate (column, agg) pair: output column names would collide")
    aggs.foreach { case (c, fn) =>
      require(df.columns.contains(c), s"column '$c' not in frame")
      require(ResampleAggs.contains(fn),
        s"unsupported agg '$fn' (supported: ${ResampleAggs.mkString(",")})")
    }
  }

  private def gridAggCols(aggs: Seq[(String, String)]): Seq[Column] =
    count(lit(1)).as("n") +: aggs.map { case (c, fn) =>
      val in = col(c)
      (fn match {
        case "sum" => sum(in); case "avg" => avg(in)
        case "min" => min(in); case "max" => max(in)
        case "count" => count(in)
      }).as(s"${fn}_$c")
    }

  /** Fixed-interval resample with GAP MATERIALIZATION — what [[resample]]
    * (a plain groupBy) cannot provide: the output carries one row per
    * bucket of the FULL [min, max] grid, absent buckets appearing with
    * n = 0, null aggregates, and `is_gap = true` — the property a
    * downstream window/ffill/chart can rely on. Rows bucket into
    * `everySeconds`-wide intervals anchored at the epoch
    * (`floor(unix_seconds/every)·every` — pure integer arithmetic, no
    * calendar convention to disagree on across engines). Null timestamps
    * are ignored.
    *
    * Scale shape: ONE map-side-combined aggregation over the rows
    * (shuffle ≤ occupied buckets), whose bounded result is
    * local-checkpointed — the bounds read and the join both consume the
    * checkpoint, so the row-scale input is scanned exactly once AND the
    * grid cannot go stale against a source that changes between
    * construction and action (the [[SkewJoin.skewReport]] bounded-
    * working-set convention). The grid arrives as a `spark.range` LEAF
    * (never a driver-side list) that left-joins the occupied buckets —
    * grid size is (max−min)/every + 1 rows regardless of input volume.
    * Empty input → empty frame (no grid to anchor).
    *
    * Output: (bucket_start timestamp, n, is_gap, then one `<fn>_<col>`
    * column per requested aggregate), ordered by bucket_start.
    */
  def resampleGrid(df: DataFrame, tsCol: String, everySeconds: Long,
                   aggs: Seq[(String, String)] = Nil,
                   maxGridRows: Long = DefaultMaxGridRows): DataFrame = {
    require(everySeconds > 0, s"need everySeconds > 0, got $everySeconds")
    require(maxGridRows > 0, s"need maxGridRows > 0, got $maxGridRows")
    require(df.columns.contains(tsCol), s"column '$tsCol' not in frame")
    validateGridAggs(df, aggs)
    val bucket = gridBucket(tsCol, everySeconds)
    val aggCols = gridAggCols(aggs)
    // bounded (≤ occupied buckets) and consumed twice (bounds + join):
    // checkpoint so the raw input is scanned ONCE and the grid cannot go
    // stale against a mutating source
    val occupied = df.where(col(tsCol).isNotNull)
      .groupBy(bucket).agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint()
    val bounds = occupied.agg(min(col("__b")), max(col("__b"))).head()
    if (!bounds.isNullAt(0)) {
      // one stray sentinel timestamp (epoch 0, year 9999) with a small
      // interval would silently turn the grid into billions of generated
      // rows — fail loudly with the offending bounds instead (r12 ADVICE)
      val span = BigInt(bounds.getLong(1)) - BigInt(bounds.getLong(0)) + 1
      require(span <= maxGridRows,
        s"resampleGrid: [min,max] bucket span $span exceeds maxGridRows=" +
          s"$maxGridRows (bucket bounds ${bounds.getLong(0)}.." +
          s"${bounds.getLong(1)} at $everySeconds s/bucket — check for " +
          "sentinel timestamps, or raise maxGridRows)")
    }
    if (bounds.isNullAt(0)) {
      // empty input: the full output schema, zero rows
      val base = occupied.withColumn("is_gap", lit(false))
      return base.select(
        timestamp_seconds(col("__b") * everySeconds).as("bucket_start") +:
          col("n") +: col("is_gap") +:
          aggs.map { case (c, fn) => col(s"${fn}_$c") }: _*)
        .where(lit(false))
    }
    val grid = df.sparkSession.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .select(col("id").as("__b"))
    grid.join(occupied, Seq("__b"), "left")
      .select(
        timestamp_seconds(col("__b") * everySeconds).as("bucket_start") +:
          coalesce(col("n"), lit(0L)).as("n") +:
          col("n").isNull.as("is_gap") +:
          aggs.map { case (c, fn) => col(s"${fn}_$c") }: _*)
      .orderBy("bucket_start")
  }

  /** Default ceiling on generated grid rows — [[resampleGrid]] globally,
    * [[resampleGridByKey]] summed over keys.
    */
  val DefaultMaxGridRows: Long = 100000000L

  /** Grid-generation chunk width for [[resampleGridByKey]]: per-key
    * buckets materialize through `sequence` arrays of at most this many
    * elements (≤ ~0.5 MB each), so a wide-span key can never allocate
    * its whole span as one in-memory array.
    */
  private val GridChunk: Long = 65536L

  /** PER-KEY grid resampling — [[resampleGrid]]'s missing half for the
    * natural sensor pipeline (per-key gap grid → [[forwardFill]]): every
    * key carries one row per bucket of ITS OWN [min, max] span, absent
    * buckets reading n = 0 / null aggregates / `is_gap = true`. Buckets
    * are the same epoch-anchored `everySeconds` intervals; rows with a
    * null key or timestamp are ignored (a null key has no well-defined
    * span, and the grid join could not reach it).
    *
    * SIZE CONTRACT: the output is Σ per-key spans rows — bounded by the
    * keys' ACTIVE RANGES, not by input volume, but unbounded in
    * principle (one sentinel timestamp stretches its key's span). The
    * call fails loudly when the sum exceeds `maxGridRows`, naming the
    * widest key. Generation is chunked ([[GridChunk]]): a key's span
    * explodes as (chunk, offset) pairs, never one span-length array.
    *
    * Scale shape: ONE map-side-combined aggregation over the rows
    * (shuffle ≤ occupied (key, bucket) cells), local-checkpointed — the
    * bounds/guard read and the join both consume the checkpoint, so the
    * row-scale input is scanned exactly once and the grid cannot go
    * stale (the [[resampleGrid]] convention). Key bounds are one more
    * bounded aggregation; the grid left-joins the occupied cells on
    * (key, bucket) — both sides grid-sized. Empty input → empty frame.
    *
    * Output: (key — original name —, bucket_start timestamp, n, is_gap,
    * then one `<fn>_<col>` column per requested aggregate), ordered by
    * (key, bucket_start).
    */
  def resampleGridByKey(df: DataFrame, keyCol: String, tsCol: String,
                        everySeconds: Long,
                        aggs: Seq[(String, String)] = Nil,
                        maxGridRows: Long = DefaultMaxGridRows): DataFrame = {
    require(everySeconds > 0, s"need everySeconds > 0, got $everySeconds")
    require(maxGridRows > 0, s"need maxGridRows > 0, got $maxGridRows")
    require(df.columns.contains(keyCol), s"column '$keyCol' not in frame")
    require(df.columns.contains(tsCol), s"column '$tsCol' not in frame")
    val outNames = Seq("bucket_start", "n", "is_gap") ++
      aggs.map { case (c, fn) => s"${fn}_$c" }
    require(!outNames.contains(keyCol),
      s"key column '$keyCol' collides with a grid output column")
    require(maxGridRows <= (1L << 53),
      s"maxGridRows=$maxGridRows above 2^53 breaks exact span arithmetic")
    validateGridAggs(df, aggs)
    aggs.foreach { case (c, _) =>
      require(c != "__k" && c != "__b",
        s"aggregate column '$c' collides with a grid-internal alias")
    }
    val bucket = gridBucket(tsCol, everySeconds)
    val aggCols = gridAggCols(aggs)
    val occupied = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k") +: bucket +:
        aggs.map(_._1).distinct.map(col): _*)
      .groupBy(col("__k"), col("__b"))
      .agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint()
    val keyBounds = occupied.groupBy(col("__k"))
      .agg(min(col("__b")).as("__mn"), max(col("__b")).as("__mx"))
    val guard = keyBounds
      .select(col("__k"), (col("__mx") - col("__mn") + 1).as("__span"))
      .agg(sum(col("__span").cast("decimal(38,0)")),
        max_by(col("__k"), col("__span")), max(col("__span")))
      .head()
    if (guard.isNullAt(0)) {
      // empty input: the full output schema, zero rows
      return occupied.withColumn("is_gap", lit(false))
        .select(col("__k").as(keyCol) +:
          timestamp_seconds(col("__b") * everySeconds).as("bucket_start") +:
          col("n") +: col("is_gap") +:
          aggs.map { case (c, fn) => col(s"${fn}_$c") }: _*)
        .where(lit(false))
    }
    val total = guard.getDecimal(0) // sum over Longs widens
    require(BigDecimal(total) <= BigDecimal(maxGridRows),
      s"resampleGridByKey: total grid rows $total (sum of per-key bucket " +
        s"spans) exceed maxGridRows=$maxGridRows — widest key " +
        s"'${guard.get(1)}' alone spans ${guard.getLong(2)} buckets at " +
        s"$everySeconds s/bucket; check for sentinel timestamps, or " +
        "raise maxGridRows")
    // chunked generation: (key, chunk) pairs explode first, then each
    // chunk's ≤GridChunk buckets — span arithmetic stays exact because
    // the guard above bounds every span below 2^53
    val grid = keyBounds
      .select(col("__k"), col("__mn"), col("__mx"),
        explode(sequence(lit(0L),
          floor((col("__mx") - col("__mn")) / GridChunk).cast(LongType)))
          .as("__c"))
      .select(col("__k"),
        explode(sequence(col("__mn") + col("__c") * GridChunk,
          least(col("__mn") + (col("__c") + 1) * GridChunk - 1,
            col("__mx")))).as("__b"))
    grid.join(occupied, Seq("__k", "__b"), "left")
      .select(col("__k").as(keyCol) +:
        timestamp_seconds(col("__b") * everySeconds).as("bucket_start") +:
        coalesce(col("n"), lit(0L)).as("n") +:
        col("n").isNull.as("is_gap") +:
        aggs.map { case (c, fn) => col(s"${fn}_$c") }: _*)
      .orderBy(col(keyCol), col("bucket_start"))
  }

  /** Per-key forward fill: null values in `cols` take the key's most
    * recent non-null value in `(tsCol, orderCols)` order — the
    * time-series repair for sparse sensors/slowly-changing attributes.
    * Values BEFORE a key's first non-null stay null (no back-fill —
    * that would leak the future). The order must be made TOTAL by
    * `orderCols` when timestamps can tie: fill results on tied rows are
    * otherwise partition-order-dependent, which is why ties without a
    * tiebreak are the caller's bug, not an engine convention. NULL
    * timestamps order LAST (`asc_nulls_last`, matching ANSI/DuckDB's
    * default): a timestampless observation can never seed a fill
    * "backward in time" into the real rows — it only receives the key's
    * latest fill itself.
    *
    * Scale shape — SKEW-SPLIT (r15, the [[Sessionize.withSessions]]
    * posture): LIGHT keys keep the one-shuffle whole-key window (all
    * fill columns ride ONE frame; task ≤ `segmentThreshold` rows), and
    * HEAVY keys — a hot sensor whose whole history would otherwise sort
    * in one task — split by (key, time-segment): the fill is
    * segment-local except values before the segment's first non-null,
    * which need only the PREVIOUS segments' last non-null per column —
    * one scalar each — carried by a prefix fold over segment-count
    * state. The per-segment state is a plain `max_by` aggregate whose
    * order key null-safely encodes the window's own total order, so it
    * map-side-combines: the heavy path pays ONE wide (key, segment)
    * shuffle + sort for the window, a CELL-scale state shuffle (never
    * rows, never a second sort), bounded merge exchanges, and a
    * broadcast rejoin when the routing proves the state side small.
    * A null-timestamp sentinel segment sorts LAST, matching the
    * whole-key nulls-last order. Same
    * [[HeavySplit]] routing/clamp knobs. Keyless fills need a constant
    * key column and the single-partition cost that implies — made
    * explicit at the API rather than silently planning a one-task sort.
    *
    * Output: the input columns with `cols` replaced by their filled
    * form (same names, same row count, no reordering guarantee beyond
    * the window's own).
    */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  cols: Seq[String],
                  orderCols: Seq[String] = Nil,
                  segmentSeconds: Long = 86400L,
                  segmentThreshold: Long =
                    EventAnalytics.DefaultSegmentThreshold,
                  split: HeavySplit = HeavySplit.Detect): DataFrame = {
    require(cols.nonEmpty, "need at least one column to fill")
    require(cols.distinct.size == cols.size, "duplicate fill column")
    require(segmentSeconds >= 0 &&
      segmentSeconds <= EventAnalytics.MaxWindowSeconds,
      s"need 0 <= segmentSeconds <= ${EventAnalytics.MaxWindowSeconds} " +
        s"(0 = auto), got $segmentSeconds")
    require(segmentThreshold > 0,
      s"need segmentThreshold > 0, got $segmentThreshold")
    (Seq(keyCol, tsCol) ++ cols ++ orderCols).foreach(c =>
      require(df.columns.contains(c), s"column '$c' not in frame"))
    // the heavy path BUCKETS by epoch micros while both paths SORT by the
    // raw column — identical orders only for genuine time types. A string
    // timestamp would sort lexicographically but bucket by parse (and
    // unparseable values would ride the null sentinel), so routing could
    // change results — the one thing HeavySplit promises never happens.
    // Loud, not silent:
    df.schema(df.schema.fieldIndex(tsCol)).dataType match {
      case TimestampType | TimestampNTZType | DateType =>
      case other => throw new IllegalArgumentException(
        s"forwardFill: tsCol '$tsCol' must be a timestamp/date column, " +
          s"got ${other.simpleString} — cast it explicitly first")
    }
    // the heavy path's merge sorts per-segment carry STRUCTS of the fill
    // values, which analysis rejects for unorderable fill types (maps);
    // the light window handles them fine — so such frames simply never
    // split (routing must not change what computes, let alone whether
    // it can)
    val splittable = cols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        df.schema(df.schema.fieldIndex(c)).dataType))
    fillSegments(df, Seq(keyCol), col(keyCol), tsCol, cols, orderCols,
      nullsLast = true, segmentSeconds, segmentThreshold,
      if (splittable) split else HeavySplit.AssumeLight)
  }

  /** Whether a carried per-segment state value of this type is
    * FIXED-WIDTH, making [[HeavySplit.StateBroadcastRows]]'s row-count
    * cutoff a sound BYTE bound for the broadcast decision: the bound says
    * nothing about bytes for strings/arrays repeated per segment, where
    * AQE's runtime sizes make the call correctly instead. A struct of
    * fixed-width fields (the as-of payload) is itself fixed-width.
    */
  private def fixedWidth(dt: DataType): Boolean = dt match {
    case _: NumericType | BooleanType | DateType | TimestampType |
         TimestampNTZType => true
    case s: StructType => s.fields.forall(f => fixedWidth(f.dataType))
    case _ => false
  }

  /** Shared skew-split RUNNING-LAST core behind [[forwardFill]] and
    * [[AsofJoin.asofJoin]] (r16): per-`keyCols` group, each null cell of
    * each of `cols` takes the group's most recent non-null value in
    * (`tsCol`, `orderCols`) ascending order (the current row's own
    * non-null value wins, `last(_, ignoreNulls)` frame semantics).
    *
    * `routeKey` is the ROUTING expression fed to [[HeavySplit]] — the key
    * column itself for a single key (exact detection), a hash of the key
    * tuple for composite keys (the r15 dimensional-slice convention:
    * a collision only shifts a slice between the two identical-result
    * paths — the window/aggregation keys are always the REAL columns, so
    * results never change). `nullsLast` picks the null-timestamp
    * convention — and it is a semantic choice, not a detail:
    * [[forwardFill]] orders null timestamps LAST (a timestampless row
    * receives the group's latest fill but can never seed one "backward in
    * time"), [[AsofJoin.asofJoin]] orders them FIRST (a timeless probe
    * row precedes all history and matches nothing). The heavy path's
    * null-sentinel segment (`Long.MaxValue` / `Long.MinValue`) and the
    * max_by order-key null encoding follow the same flag, so both paths
    * always agree.
    *
    * Scale shape (verified r15, BENCH_SF1 §r15.3): light keys pay one
    * whole-key window; heavy keys pay one (key, segment) window plus a
    * CELL-scale map-side-combinable max_by state, a per-key prefix fold
    * over segment-count state, and a broadcast rejoin when the routing
    * proves the state side small and the carried types are fixed-width.
    */
  private[ops] def fillSegments(df: DataFrame, keyCols: Seq[String],
                                routeKey: Column, tsCol: String,
                                cols: Seq[String], orderCols: Seq[String],
                                nullsLast: Boolean, segmentSeconds: Long,
                                segmentThreshold: Long,
                                split: HeavySplit): DataFrame = {
    def ordOf(c: Column): Column =
      if (nullsLast) c.asc_nulls_last else c.asc_nulls_first
    val ord = ordOf(col(tsCol)) +: orderCols.map(c => ordOf(col(c)))

    def lightFill(src: DataFrame): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cols.foldLeft(src) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    }

    val us = unix_micros(col(tsCol).cast(TimestampType))
    val routing = HeavySplit.resolve(split, df, routeKey, us,
      segmentThreshold)
    if (!HeavySplit.hasHeavy(routing)) return lightFill(df)

    val isHeavy = HeavySplit.isHeavy(routeKey, routing)
    val segMicros = HeavySplit.effectiveSegmentMicros(df, isHeavy, us,
      segmentSeconds, routing)

    def heavyFill(src: DataFrame): DataFrame = {
      val names = HeavySplit.freshNames(df.columns.toSeq)(
        Seq("__seg", "__segs", "__ms", "__m") ++
          keyCols.map(k => s"__mk_$k") ++
          cols.map(c => s"__lf_$c") ++ cols.map(c => s"__cf_$c") ++
          cols.map(c => s"__v_$c"): _*)
      val Seq(segN, segsN, sJ, mN) = names.take(4)
      val kJ = keyCols.zip(names.slice(4, 4 + keyCols.size)).toMap
      val rest = names.drop(4 + keyCols.size)
      val localN = cols.zip(rest.take(cols.size)).toMap
      val carryN = cols.zip(rest.slice(cols.size, 2 * cols.size)).toMap
      val stateN = cols.zip(rest.drop(2 * cols.size)).toMap
      // the null-timestamp sentinel segment sorts where the null rows
      // themselves sort: Long.MaxValue under nulls-last (forwardFill —
      // the mirror image of Sessionize's nulls-first MinValue),
      // Long.MinValue under nulls-first (asofJoin)
      val sentinel = if (nullsLast) Long.MaxValue else Long.MinValue
      val seg = coalesce(us - pmod(us, lit(segMicros)), lit(sentinel))
      val withSeg = src.withColumn(segN, seg)
      val w = Window.partitionBy((keyCols :+ segN).map(col): _*)
        .orderBy(ord: _*)
      val frame = w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val rows = cols.foldLeft(withSeg) { (d, c) =>
        d.withColumn(localN(c),
          last(col(c), ignoreNulls = true).over(frame))
      }
      // per-segment state: last non-null per column as a PLAIN max_by
      // aggregate — map-side combinable, so the state branch shuffles
      // CELL-scale partials, never rows, and needs no second sort. The
      // order key encodes the window's exact (ts, orderCols) total order
      // null-safely: a leading boolean per component (false < true) puts
      // nulls on the same side the window sorts them, so the aggregate
      // and the window can never disagree on which value is "last";
      // rows whose fill value is null are excluded via the max_by key
      // (a null key never wins).
      def nullBit(c: Column): Column =
        if (nullsLast) c.isNull else c.isNotNull
      val ordKey = struct(
        nullBit(us).as("n0") +: us.as("k0") +:
          orderCols.zipWithIndex.flatMap { case (c, i) =>
            Seq(nullBit(col(c)).as(s"n${i + 1}"), col(c).as(s"k${i + 1}"))
          }: _*)
      val stateAggs = cols.map(c =>
        max_by(col(c), when(col(c).isNotNull, ordKey)).as(stateN(c)))
      val segState = withSeg.groupBy((keyCols :+ segN).map(col): _*)
        .agg(stateAggs.head, stateAggs.tail: _*)
      // per-key carry INTO each segment: the latest PRECEDING occupied
      // segment's last non-null per column — a linear segment-scale
      // window (`last(_, ignoreNulls)` over the previous segments; a
      // segment that saw no non-null value keeps a null state, which the
      // ignoreNulls frame skips exactly as the former coalesce chain
      // did). This replaces the collect_list + higher-order fold whose
      // array-concat accumulation was QUADRATIC in a key's occupied
      // segments (r16 measurement: at the 4096-segment clamp the fold
      // alone read ~3 s per heavy pass at sf0.1; the window form reads
      // segment-scale like everything else on this frame).
      val wSeg = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(segN))
        .rowsBetween(Window.unboundedPreceding, -1)
      val merged = segState.select(
        keyCols.map(k => col(k).as(kJ(k))) ++
          (col(segN).as(sJ) +:
            cols.map(c => last(col(stateN(c)), ignoreNulls = true)
              .over(wSeg).as(carryN(c)))): _*)
      // provably-small state side broadcasts (the Sessionize rationale:
      // no join shuffle/sort on the row-scale side) — but only when
      // every carried fill value is FIXED-WIDTH (see [[fixedWidth]])
      val stateSide =
        if (cols.forall(c => fixedWidth(
          df.schema(df.schema.fieldIndex(c)).dataType)))
          HeavySplit.maybeBroadcastState(merged, routing, segMicros)
        else merged
      val joinCond = keyCols.map(k => col(k) <=> col(kJ(k)))
        .reduce(_ && _) && col(segN) === col(sJ)
      rows.join(stateSide, joinCond)
        .select(df.columns.map { c =>
          if (localN.contains(c))
            coalesce(col(localN(c)), col(carryN(c))).as(c)
          else col(c)
        }: _*)
    }

    if (routing.allHeavy) heavyFill(df)
    else lightFill(df.where(!isHeavy)).unionAll(heavyFill(df.where(isHeavy)))
  }
}
