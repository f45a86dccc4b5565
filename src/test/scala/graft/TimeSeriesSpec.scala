package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

/** Resample gap materialization and forward-fill semantics. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("resampleGrid: epoch-anchored buckets, gap rows materialized with " +
      "n = 0 and null aggregates") {
    val d = Seq(
      (ts(5), 1.0), (ts(8), 3.0),  // bucket 0 [0, 10)
      (ts(25), 5.0),               // bucket 2 — bucket 1 is a GAP
      (ts(31), 7.0), (ts(39), 9.0) // bucket 3
    ).toDF("t", "v")
    val out = TimeSeries.resampleGrid(d, "t", 10,
      Seq("v" -> "sum", "v" -> "max")).collect()
    assert(out.length == 4) // buckets 0..3, gap included
    val byStart = out.map(r => r.getTimestamp(0).getTime / 1000 -> r).toMap
    val b0 = byStart(0L)
    assert(b0.getLong(1) == 2 && !b0.getBoolean(2))
    assert(b0.getDouble(3) == 4.0 && b0.getDouble(4) == 3.0)
    val gap = byStart(10L)
    assert(gap.getLong(1) == 0 && gap.getBoolean(2))
    assert(gap.isNullAt(3) && gap.isNullAt(4))
    assert(byStart(20L).getLong(1) == 1)
    assert(byStart(30L).getDouble(3) == 16.0)
    // null timestamps ignored; empty input -> empty frame, schema intact
    val e = TimeSeries.resampleGrid(d.where(col("v") > 99), "t", 10,
      Seq("v" -> "sum"))
    assert(e.count() == 0)
    assert(e.columns.toSeq ==
      Seq("bucket_start", "n", "is_gap", "sum_v"))
    intercept[IllegalArgumentException] {
      TimeSeries.resampleGrid(d, "t", 10, Seq("v" -> "median"))
    }
  }

  test("resampleGrid: sentinel-wide spans fail loudly at maxGridRows") {
    val d = Seq((ts(0), 1.0), (ts(100000), 2.0)).toDF("t", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.resampleGrid(d, "t", 1, Nil, maxGridRows = 1000L)
    }
    assert(e.getMessage.contains("maxGridRows=1000"))
    assert(e.getMessage.contains("100001"))
  }

  test("resampleGridByKey: per-key spans, gaps marked, keys isolated") {
    val d = Seq(
      ("a", ts(5), 1.0), ("a", ts(25), 5.0),   // a spans buckets 0..2, 1 gap
      ("b", ts(35), 7.0),                      // b spans only bucket 3
      (null.asInstanceOf[String], ts(5), 9.0)  // null key ignored
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleGridByKey(d, "k", "t", 10,
      Seq("v" -> "min", "v" -> "count")).collect()
    assert(out.length == 4) // a: 0,1,2; b: 3
    val m = out.map(r => (r.getString(0),
      r.getTimestamp(1).getTime / 1000) -> r).toMap
    assert(m(("a", 0L)).getLong(2) == 1 && !m(("a", 0L)).getBoolean(3) &&
      m(("a", 0L)).getDouble(4) == 1.0 && m(("a", 0L)).getLong(5) == 1L)
    assert(m(("a", 10L)).getLong(2) == 0 && m(("a", 10L)).getBoolean(3) &&
      m(("a", 10L)).isNullAt(4))
    assert(m(("a", 20L)).getDouble(4) == 5.0)
    assert(m(("b", 30L)).getDouble(4) == 7.0)
    assert(!m.contains(("b", 0L))) // b's grid starts at ITS min, not a's
    // empty input -> empty frame, schema intact
    val e = TimeSeries.resampleGridByKey(d.where(col("v") > 99), "k", "t",
      10, Seq("v" -> "min"))
    assert(e.count() == 0)
    assert(e.columns.toSeq ==
      Seq("k", "bucket_start", "n", "is_gap", "min_v"))
    // sum-of-spans guard names the widest key
    val wide = Seq(("w", ts(0), 1.0), ("w", ts(5000), 1.0),
      ("n", ts(0), 1.0)).toDF("k", "t", "v")
    val g = intercept[IllegalArgumentException] {
      TimeSeries.resampleGridByKey(wide, "k", "t", 1, Nil,
        maxGridRows = 100L)
    }
    assert(g.getMessage.contains("'w'"))
  }

  test("resampleGridByKey: chunked generation crosses chunk boundaries " +
      "without loss") {
    // span 70001 > the 65536 chunk width: every bucket present exactly once
    val d = Seq(("a", ts(0), 1.0), ("a", ts(70000), 2.0)).toDF("k", "t", "v")
    val out = TimeSeries.resampleGridByKey(d, "k", "t", 1, Nil)
    assert(out.count() == 70001L)
    assert(out.select(countDistinct(col("bucket_start"))).head().getLong(0)
      == 70001L)
    val occ = out.where(!col("is_gap")).collect()
      .map(_.getTimestamp(1).getTime / 1000).sorted
    assert(occ.toSeq == Seq(0L, 70000L))
  }

  test("resampleGridByKey composes with forwardFill: per-key gap grid " +
      "then per-key fill") {
    val d = Seq(
      ("a", ts(5), 1.0), ("a", ts(25), 5.0),
      ("b", ts(35), 7.0), ("b", ts(55), 9.0)
    ).toDF("k", "t", "v")
    val grid = TimeSeries.resampleGridByKey(d, "k", "t", 10,
      Seq("v" -> "min"))
    val filled = TimeSeries.forwardFill(grid, "k", "bucket_start",
      Seq("min_v")).collect()
    val m = filled.map(r => (r.getString(0),
      r.getTimestamp(1).getTime / 1000) -> r).toMap
    // a's bucket-1 gap takes a's previous value, never b's
    assert(m(("a", 10L)).getBoolean(3) && m(("a", 10L)).getDouble(4) == 1.0)
    assert(m(("b", 40L)).getDouble(4) == 7.0)
  }

  test("forwardFill: last non-null per key in total order; no back-fill; " +
      "keys isolated") {
    val d = Seq[(Int, Timestamp, Option[Double], Option[String])](
      (1, ts(1), Some(1.0), None),        // v filled forward, s leads null
      (1, ts(2), None, Some("x")),
      (1, ts(3), None, None),
      (1, ts(4), Some(4.0), Some("y")),
      (2, ts(1), None, Some("z")),        // key 2: v never non-null
      (2, ts(5), None, None)
    ).toDF("k", "t", "v", "s")
    val out = TimeSeries.forwardFill(d, "k", "t", Seq("v", "s"))
      .orderBy("k", "t").collect()
    assert(out(0).getDouble(2) == 1.0 && out(0).isNullAt(3)) // no back-fill
    assert(out(1).getDouble(2) == 1.0 && out(1).getString(3) == "x")
    assert(out(2).getDouble(2) == 1.0 && out(2).getString(3) == "x")
    assert(out(3).getDouble(2) == 4.0 && out(3).getString(3) == "y")
    assert(out(4).isNullAt(2) && out(4).getString(3) == "z")
    assert(out(5).isNullAt(2) && out(5).getString(3) == "z") // key-local
    // tied timestamps become deterministic through orderCols
    val tied = Seq((1, ts(1), Option(9.0), 1), (1, ts(1), None, 2))
      .toDF("k", "t", "v", "seq")
    val tf = TimeSeries.forwardFill(tied, "k", "t", Seq("v"),
      orderCols = Seq("seq")).orderBy("seq").collect()
    assert(tf(0).getDouble(2) == 9.0 && tf(1).getDouble(2) == 9.0)
  }

  test("skew-split forwardFill: brute-force parity across widths, " +
      "thresholds and routing policies (null keys/ts/values)") {
    val rnd = new scala.util.Random(20250815)
    // hot keys 1/2, a real null key, ~10% null ts (sorting LAST), two
    // fill columns (double + string) with heavy null runs so the carry
    // actually crosses segments
    val rows = (0L until 400L).map { eid =>
      val k = rnd.nextInt(6) match {
        case 0 => None
        case n => Some((n % 3).toLong)
      }
      val us =
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.nextInt(2000).toLong * 1000000L)
      val v = if (rnd.nextInt(4) == 0) Some(rnd.nextInt(100).toDouble)
        else None
      val sv = if (rnd.nextInt(6) == 0) Some(s"s${rnd.nextInt(9)}")
        else None
      (k, us, eid, v, sv)
    }
    val df = rows.map { case (k, us, eid, v, sv) =>
      (k.map(java.lang.Long.valueOf).orNull,
        us.map(u => new Timestamp(u / 1000L)).orNull, eid,
        v.map(java.lang.Double.valueOf).orNull, sv.orNull)
    }.toDF("k", "t", "eid", "v", "s")
    // reference: per key, (ts NULLS LAST, eid) order, carry last non-null
    val expected: Map[Long, (Option[Double], Option[String])] =
      rows.groupBy(_._1).iterator.flatMap { case (_, g) =>
        val sorted = g.sortBy(r => (r._2.isEmpty, r._2.getOrElse(0L), r._3))
        var cv: Option[Double] = None
        var cs: Option[String] = None
        sorted.map { case (_, _, eid, v, sv) =>
          cv = v.orElse(cv); cs = sv.orElse(cs)
          eid -> (cv, cs)
        }
      }.toMap
    val detected = ops.HeavySplit.detect(df, "k", "t", 20L)
    assert(detected.keys.nonEmpty, "fixture must produce heavy keys")
    val configs: Seq[(Long, Long, ops.HeavySplit)] = Seq(
      (86400L, 1000000L, ops.HeavySplit.Detect), // all light
      (1L, 1L, ops.HeavySplit.Detect), // mixed, many segments
      (0L, 5L, ops.HeavySplit.Detect), // AUTO width
      (1L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true)),
      (7L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true,
        maxSpanMicros = Some(2000L * 1000000L))),
      (86400L, 1L, ops.HeavySplit.AssumeLight),
      (60L, 20L, detected),
      (0L, 20L, detected))
    configs.foreach { case (segS, thr, split) =>
      val out = TimeSeries.forwardFill(df, "k", "t", Seq("v", "s"),
          orderCols = Seq("eid"), segmentSeconds = segS,
          segmentThreshold = thr, split = split)
        .select("eid", "v", "s").collect()
      assert(out.length == rows.size, s"row count under ($segS,$thr,$split)")
      out.foreach { r =>
        val eid = r.getLong(0)
        val got = (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          Option(r.getString(2)))
        assert(got == expected(eid),
          s"eid $eid under ($segS,$thr,$split): got $got, " +
            s"want ${expected(eid)}")
      }
    }
  }

  test("plan: heavy forwardFill — ONE window, every sort leads with " +
      "(key, segment), state map-side-combines (partial_max_by)") {
    val d = Seq((1L, ts(0), Option(1.0)), (1L, ts(50), None))
      .toDF("k", "t", "v")
    val plan = TimeSeries.forwardFill(d, "k", "t", Seq("v"),
        segmentSeconds = 60L,
        split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .queryExecution.executedPlan.toString
    // exactly TWO windows: the row-scale fill window and the
    // segment-scale carry window (r16 — the carry window replaced the
    // quadratic collect_list fold; its input is the per-segment state
    // frame, never rows)
    assert("Window \\[".r.findAllIn(plan).size == 2,
      s"exactly the fill + segment-carry windows expected:\n$plan")
    assert(plan.contains("partial_max_by"),
      s"the per-segment state must map-side-combine:\n$plan")
    val sorts = "(?s)Sort \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
      .filter(_.contains("__seg"))
    assert(sorts.nonEmpty, s"expected segment-window sorts:\n$plan")
    sorts.foreach { s =>
      val cs = s.split(",").map(_.trim)
      assert(cs.head.startsWith("k#") && cs(1).startsWith("__seg"),
        s"sort must lead with (key, segment), got: $s\n$plan")
    }
  }
  test("rollingAggregate: a NULL timestamp has no trailing window " +
      "(explicit null outputs), and the cum-diff equals brute force") {
    val d = Seq(
      (1L, Option(ts(0)), 1.0), (1L, Option(ts(30)), 2.0),
      (1L, Option(ts(100)), 4.0), (1L, None, 8.0), (1L, None, 16.0),
      (2L, Option(ts(5)), 3.0)
    ).map { case (k, t, v) => (k, t.orNull, v) }.toDF("k", "t", "v")
    val out = TimeSeries.rollingAggregate(d, "k", "t", "v",
        windowSeconds = 60L)
      .select("k", "v", "n_window", "sum_cents_window").collect()
      .map(r => (r.getLong(0), r.getDouble(1)) ->
        ((if (r.isNullAt(2)) None else Some(r.getLong(2))),
          (if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // brute force over [t-60s, t]: v=1 alone; v=2 sees {1,2}; v=4 sees
    // {2,4} (t=100 vs t=30 within 70s? 100-30=70 > 60 -> only {4}? no:
    // 100-60=40 <= t' -> t'=30 excluded, so {4} alone)... pinned:
    assert(out((1L, 1.0)) == ((Some(1L), Some(100L))))
    assert(out((1L, 2.0)) == ((Some(2L), Some(300L))))
    assert(out((1L, 4.0)) == ((Some(1L), Some(400L))))
    assert(out((2L, 3.0)) == ((Some(1L), Some(300L))))
    // null-ts rows: both outputs null, never the null-peer-group count
    assert(out((1L, 8.0)) == ((None, None)))
    assert(out((1L, 16.0)) == ((None, None)))
  }

  test("rollingExtrema: two-bucket decomposition equals brute force " +
      "(boundary inclusive, ties, null values/timestamps/keys)") {
    val rnd = new scala.util.Random(1616)
    // 1s grid over ~40 windows so windows straddle bucket boundaries;
    // ties, null keys, null timestamps, ~30% null values
    val rows = (0L until 500L).map { id =>
      val k = rnd.nextInt(8) match {
        case 0 => None
        case n => Some((n % 3).toLong)
      }
      val t = if (rnd.nextInt(12) == 0) None
        else Some(rnd.nextInt(400).toLong * 1000000L)
      val v = if (rnd.nextInt(3) == 0) None
        else Some(rnd.nextInt(1000).toDouble)
      (id, k, t, v)
    }
    val df = rows.map { case (id, k, t, v) =>
      (id, k.map(java.lang.Long.valueOf).orNull,
        t.map(u => new Timestamp(u / 1000L)).orNull,
        v.map(java.lang.Double.valueOf).orNull)
    }.toDF("id", "k", "t", "v")
    val W = 10L // seconds
    val wUs = W * 1000000L
    val expected = rows.map { case (id, k, t, _) =>
      val ex = t.map { tt =>
        val in = rows.filter(r => r._2 == k && r._3.exists(x =>
          x >= tt - wUs && x <= tt) && r._4.isDefined).flatMap(_._4)
        (in.minOption, in.maxOption)
      }.getOrElse((None, None))
      id -> ex
    }.toMap
    val out = TimeSeries.rollingExtrema(df, "k", "t", "v", W)
      .select("id", "min_window", "max_window").collect()
    assert(out.length == rows.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val got = (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      assert(got == expected(id), s"id $id: got $got, want ${expected(id)}")
    }
  }

  test("rollingAggregateBucketed: exact parity with rollingAggregate " +
      "on a random fixture (null keys/timestamps/values, ties)") {
    val rnd = new scala.util.Random(4321)
    val rows = (0L until 400L).map { id =>
      val k = rnd.nextInt(8) match {
        case 0 => None
        case n => Some((n % 3).toLong)
      }
      val t = if (rnd.nextInt(12) == 0) None
        else Some(rnd.nextInt(300).toLong * 1000000L)
      val v = if (rnd.nextInt(3) == 0) None
        else Some(rnd.nextInt(1000) / 4.0)
      (id, k, t, v)
    }
    val df = rows.map { case (id, k, t, v) =>
      (id, k.map(java.lang.Long.valueOf).orNull,
        t.map(u => new Timestamp(u / 1000L)).orNull,
        v.map(java.lang.Double.valueOf).orNull)
    }.toDF("id", "k", "t", "v")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "n_window", "sum_cents_window").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
            (if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    for (w <- Seq(7L, 60L, 1000L)) {
      val a = canon(TimeSeries.rollingAggregate(df, "k", "t", "v", w))
      val b = canon(TimeSeries.rollingAggregateBucketed(df, "k", "t", "v", w))
      assert(a == b, s"divergence at windowSeconds=$w")
      assert(a.size == rows.size)
    }
  }

  test("rollingExtrema plan: no sliding frame — every window frame is " +
      "grow-only (one unbounded side), partitioned by (key, bucket)") {
    val d = Seq((1L, ts(0), 1.0), (1L, ts(5), 2.0)).toDF("k", "t", "v")
    val plan = TimeSeries.rollingExtrema(d, "k", "t", "v", 60L)
      .queryExecution.executedPlan.toString
    // a sliding RANGE frame would print "specifiedwindowframe(RangeFrame,
    // -N, currentrow$())" — both moving bounds — and an
    // unboundedFOLLOWING frame re-aggregates per row (no retraction);
    // only unboundedPreceding frames evaluate incrementally
    assert(!plan.contains("-60000000"),
      s"sliding frame leaked into the plan:\n$plan")
    assert(plan.toLowerCase.contains("unboundedpreceding"),
      s"no grow-only frame:\n$plan")
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      s"per-row re-aggregating unboundedFollowing frame in plan:\n$plan")
  }

  test("forwardFill: unorderable (map) fill columns never split — the " +
      "heavy merge can't sort their carry, and routing must not change " +
      "what computes") {
    val d = Seq((1L, ts(0), Map("a" -> 1)), (1L, ts(50), Map("b" -> 2)))
      .toDF("k", "t", "m")
    // forced-heavy routing on a map fill column still computes (light
    // plan) and fills nothing (no nulls here) — no analysis error
    val out = TimeSeries.forwardFill(d, "k", "t", Seq("m"),
        split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .collect()
    assert(out.length == 2)
  }

  test("forwardFill: a non-time tsCol fails loudly (heavy buckets by " +
      "parse, light sorts raw — routing could change results)") {
    val d = Seq((1L, "2024-9-05", Option(1.0)), (1L, "2024-10-07", None))
      .toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.forwardFill(d, "k", "t", Seq("v"))
    }
    assert(e.getMessage.contains("timestamp/date"))
  }
}
