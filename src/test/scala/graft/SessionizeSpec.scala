package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Sessionize

/** Gap-based sessionization: assignment semantics and the one-shuffle plan. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def events = Seq(
    // user 1: two sessions — break at the 1000s gap
    (1L, 1L, ts(0)), (1L, 2L, ts(50)), (1L, 3L, ts(99)),
    (1L, 4L, ts(1200)), (1L, 5L, ts(1250)),
    // user 2: one single-event session
    (2L, 6L, ts(500))
  ).toDF("user_id", "event_id", "ts")

  test("withSessions: gap starts a new 0-based session per key") {
    val out = Sessionize.withSessions(events, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"))
      .select("user_id", "event_id", "session_index")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 0L),
      (1L, 4L, 1L), (1L, 5L, 1L),
      (2L, 6L, 0L)))
  }

  test("sessionStats: counts, bounds and duration per session") {
    val out = Sessionize.sessionStats(events, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"))
      .orderBy("user_id", "session_index")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, 3L, 0L, 99000000L, 99000000L),
      (1L, 1L, 2L, 1200000000L, 1250000000L, 50000000L),
      (2L, 0L, 1L, 500000000L, 500000000L, 0L)))
  }

  test("equal timestamps always share a session regardless of tie order") {
    val tied = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(0)),      // tie at session start
      (1L, 12L, ts(500)), (1L, 13L, ts(500))   // tie right after a gap break
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.withSessions(tied, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"))
      .select("event_id", "session_index")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(10L) == out(11L))
    assert(out(12L) == out(13L))
    assert(out(10L) != out(12L))
  }

  test("plan: windows and session aggregation share ONE hash exchange") {
    val plan = Sessionize.sessionStats(events, "user_id", "ts", gapSeconds = 100)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  // ---- r15 skew split ----

  /** Reference sessionizer mirroring the documented total order and null
    * semantics: (ts NULLS FIRST, tiebreak) per key; a new session when
    * there is no previous row, the previous timestamp is null, or the
    * gap exceeds the bound.
    */
  private def refSessions(rows: Seq[(Option[Long], Option[Long], Long)],
                          gapSeconds: Long): Map[Long, Long] =
    rows.groupBy(_._1).iterator.flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._2.isDefined, r._2.getOrElse(0L), r._3))
      var prev: Option[Long] = None
      var started = false
      var idx = -1L
      sorted.map { case (_, us, eid) =>
        val isNew = !started || prev.isEmpty ||
          (us.isDefined && us.get - prev.get > gapSeconds * 1000000L)
        if (isNew) idx += 1
        started = true
        prev = us
        eid -> idx
      }
    }.toMap

  private def mkDf(rows: Seq[(Option[Long], Option[Long], Long)]) = {
    import java.sql.Timestamp
    rows.map { case (k, us, eid) =>
      (k.map(java.lang.Long.valueOf).orNull,
        us.map(u => new Timestamp(u / 1000L)).orNull,
        eid, s"p$eid")
    }.toDF("k", "ts", "eid", "payload")
  }

  test("skew-split withSessions: brute-force parity across widths, " +
      "thresholds and routing policies (nulls included)") {
    val rnd = new scala.util.Random(20250816)
    // millisecond-aligned micros so Timestamp round-trips exactly; keys
    // 1/2 are hot, key null is real, ~5% null timestamps, frequent ties
    val rows = (0L until 400L).map { eid =>
      val k = rnd.nextInt(6) match {
        case 0 => None
        case n => Some((n % 3).toLong)
      }
      val us =
        if (rnd.nextInt(20) == 0) None
        else Some(rnd.nextInt(2000).toLong * 1000000L)
      (k, us, eid)
    }
    val df = mkDf(rows)
    val expected = refSessions(rows, gapSeconds = 30L)
    val detected = ops.HeavySplit.detect(df, "k", "ts", 20L)
    assert(detected.keys.nonEmpty, "fixture must produce heavy keys")
    val configs: Seq[(Long, Long, ops.HeavySplit)] = Seq(
      (86400L, 1000000L, ops.HeavySplit.Detect), // all light
      (1L, 1L, ops.HeavySplit.Detect), // mixed, many segments
      (0L, 5L, ops.HeavySplit.Detect), // AUTO width
      (3600L, 10L, ops.HeavySplit.Detect), // one fat segment
      (1L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true)), // all segmented
      (7L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true,
        maxSpanMicros = Some(2000L * 1000000L))),
      (86400L, 1L, ops.HeavySplit.AssumeLight), // opt-out stays light
      (60L, 20L, detected), // precomputed routing reused
      (0L, 20L, detected) // precomputed routing, AUTO from its span
    )
    configs.foreach { case (segS, thr, split) =>
      val out = Sessionize.withSessions(df, "k", "ts", gapSeconds = 30L,
          orderCols = Seq("eid"), segmentSeconds = segS,
          segmentThreshold = thr, split = split)
        .select(col("eid"), col("session_index"), col("payload"))
        .collect()
      assert(out.length == rows.size, s"row count under ($segS,$thr,$split)")
      out.foreach { r =>
        val eid = r.getLong(0)
        assert(r.getLong(1) == expected(eid),
          s"eid $eid under ($segS,$thr,$split): got ${r.getLong(1)}, " +
            s"want ${expected(eid)}")
        assert(r.getString(2) == s"p$eid", "payload column must survive")
      }
    }
  }

  test("skew-split sessionStats: q57 shape unchanged when forced heavy") {
    val light = Sessionize.sessionStats(events, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"))
      .orderBy("user_id", "session_index").collect().toSeq
    val heavy = Sessionize.sessionStats(events, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"),
        segmentSeconds = 60L,
        split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .orderBy("user_id", "session_index").collect().toSeq
    assert(light == heavy)
  }

  test("input with a session_index column fails loudly") {
    val bad = events.withColumn("session_index", lit(0L))
    intercept[IllegalArgumentException] {
      Sessionize.withSessions(bad, "user_id", "ts", gapSeconds = 100)
    }
  }

  test("plan: heavy path — every sort leads with (key, segment); exactly " +
      "two row-scale (key, segment) exchanges (wide window + narrow state)") {
    val plan = Sessionize.withSessions(events, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"),
        segmentSeconds = 60L,
        split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .queryExecution.executedPlan.toString
    // the state branch cannot reuse the window branch's exchange (its
    // input is column-pruned narrower — sessionize carries every input
    // column, unlike the fixed-narrow consecutiveWindows base), so the
    // heavy path pays exactly TWO (key, segment) exchanges: the wide
    // row shuffle and the narrow state shuffle. A third would mean the
    // shape regressed; one would mean the state silently rides the wide
    // plan (pruning broke).
    val kseg = "Exchange hashpartitioning\\(user_id#\\d+L, __seg#\\d+L".r
      .findAllIn(plan).size
    assert(kseg == 2, s"expected 2 (key, segment) exchanges, got $kseg:\n$plan")
    val sorts = "(?s)Sort \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
      .filter(_.contains("__seg"))
    assert(sorts.nonEmpty, s"expected segment-window sorts:\n$plan")
    sorts.foreach { s =>
      val cols = s.split(",").map(_.trim)
      assert(cols.head.startsWith("user_id") && cols(1).startsWith("__seg"),
        s"sort must lead with (key, segment), got: $s\n$plan")
    }
  }

  test("HeavySplit.detect under allHeavy: no keys, NO span — a capped " +
      "sample cannot bound the tail (the clamp falls back honestly)") {
    val rows = (0L until 40L).flatMap(k =>
      (0L until 3L).map(i => (Some(k): Option[Long],
        Some(i * 1000000L): Option[Long], k * 3 + i)))
    val df = mkDf(rows)
    val k = ops.HeavySplit.detect(df, "k", "ts", 1L, maxHeavy = 10)
    assert(k.allHeavy && k.keys.isEmpty && k.maxSpanMicros.isEmpty)
    // sessions still exact through the span-less allHeavy routing with
    // an AUTO width (one bounded span read over the heavy = all rows)
    val expected = refSessions(rows, gapSeconds = 2L)
    val out = Sessionize.withSessions(df, "k", "ts", gapSeconds = 2L,
        orderCols = Seq("eid"), segmentSeconds = 0L, split = k)
      .select("eid", "session_index").collect()
    out.foreach(r => assert(r.getLong(1) == expected(r.getLong(0))))
  }

  test("freshNames avoids input columns case-insensitively (Spark " +
      "resolution is case-insensitive: '__Seg' would capture '__seg')") {
    val mixed = Seq((1L, 1L, ts(0), "x"), (1L, 2L, ts(5000), "y"))
      .toDF("user_id", "event_id", "ts", "__Seg")
    val out = Sessionize.withSessions(mixed, "user_id", "ts",
        gapSeconds = 100, orderCols = Seq("event_id"),
        split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .orderBy("event_id").collect()
    // the user's __Seg column survives untouched and sessions are right
    assert(out.map(_.getAs[String]("__Seg")).toSeq == Seq("x", "y"))
    assert(out.map(_.getAs[Long]("session_index")).toSeq == Seq(0L, 1L))
  }

  test("HeavySplit.detect: spans, caps, null keys; clamp arithmetic") {
    val rows = (0L until 30L).map(i => (Some(1L): Option[Long],
      Some(i * 1000000L): Option[Long], i)) ++
      (30L until 60L).map(i => (None: Option[Long],
        Some(0L): Option[Long], i)) ++
      Seq((Some(2L): Option[Long], None: Option[Long], 60L))
    val df = mkDf(rows)
    val k = ops.HeavySplit.detect(df, "k", "ts", 5L)
    // key 1 (30 events, span 29s+1µs) and null key (30 events) are heavy;
    // key 2 (1 event) is not
    assert(k.keys.toSet == Set(1L, null))
    assert(!k.allHeavy)
    assert(k.maxSpanMicros.contains(29L * 1000000L + 1L))
    // clamp: a 1µs width over that span rises to ceil(span/AutoSegments)
    val span = k.maxSpanMicros.get
    val clamped = 7081L // ceil(29000001 / 4096)
    assert(ops.HeavySplit.clampSegmentMicros(1L, Some(span)) == clamped)
    // a width already above the bound is trusted as given
    assert(ops.HeavySplit.clampSegmentMicros(span, Some(span)) == span)
    assert(ops.HeavySplit.clampSegmentMicros(1L, None) == 1L)
  }
}
