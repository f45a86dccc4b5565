package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{EventAnalytics, SkewJoin}

/** Funnel / cohort-retention semantics and the join-cardinality profile. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel: greedy-earliest equals nested-min; strict-after rule; " +
      "off-funnel and null rows ignored") {
    val evs = Seq[(java.lang.Long, Timestamp, String)](
      // user 1 completes a -> b -> c (with noise between)
      (1L, ts(10), "a"), (1L, ts(15), "x"), (1L, ts(20), "b"),
      (1L, ts(30), "c"),
      // user 2: b BEFORE its first a — never reaches step 2
      (2L, ts(10), "b"), (2L, ts(20), "a"),
      // user 3: a then b at the SAME ts — ties do not advance
      (3L, ts(10), "a"), (3L, ts(10), "b"),
      // user 4: a only
      (4L, ts(5), "a"),
      // null user ignored entirely
      (null, ts(1), "a")
    ).toDF("u", "t", "y")
    val out = EventAnalytics.funnel(evs, "u", "t", "y",
      Seq("a", "b", "c")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 1L, 1L))
    assert(out(0).getDouble(3) == 1.0 && out(0).getDouble(4) == 1.0)
    assert(out(1).getDouble(3) == 1.0 / 4 && out(1).getDouble(4) == 1.0 / 4)
    assert(out(2).getDouble(3) == 1.0) // 1 of 1 converts b -> c
    // greedy-earliest = nested-min: user 5 has TWO a events; matching
    // the earliest a leaves the early b reachable
    val tricky = Seq((5L, ts(10), "a"), (5L, ts(20), "b"),
      (5L, ts(30), "a")).toDF("u", "t", "y")
    val t = EventAnalytics.funnel(tricky, "u", "t", "y", Seq("a", "b"))
      .collect()
    assert(t(1).getLong(2) == 1L)
    // empty frame: all steps emitted with zero counts and 0.0 ratios
    val e = EventAnalytics.funnel(evs.where(col("u") > 99), "u", "t", "y",
      Seq("a", "b")).collect()
    assert(e.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(e.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(evs, "u", "t", "y", Seq("a", "a"))
    }
  }

  test("funnel property: fold verdicts equal a brute-force nested-min") {
    val rnd = new scala.util.Random(11)
    val steps = Seq("s1", "s2", "s3")
    for (trial <- 1 to 4) {
      val rows = Seq.fill(300)((rnd.nextInt(25).toLong,
        ts(rnd.nextInt(1000)), s"s${rnd.nextInt(4) + 1}"))
      val got = EventAnalytics.funnel(rows.toDF("u", "t", "y"),
        "u", "t", "y", steps).collect().map(_.getLong(2)).toSeq
      // brute force: nested min per user
      val byUser = rows.groupBy(_._1).values
      def reached(g: Seq[(Long, Timestamp, String)]): Int = {
        var last: Option[Timestamp] = None
        var r = 0
        for (s <- steps) {
          val cand = g.filter(e => e._3 == s &&
            last.forall(l => e._2.after(l))).map(_._2)
          if (r == steps.indexOf(s) && cand.nonEmpty) {
            last = Some(cand.minBy(_.getTime))
            r += 1
          }
        }
        r
      }
      val exp = (1 to steps.size).map(i =>
        byUser.count(g => reached(g.toSeq) >= i).toLong)
      assert(got == exp, s"trial $trial")
    }
  }

  test("cohortRetention: anchored-day buckets, cohort-relative offsets, " +
      "exact ratios") {
    def d(day: Int) = ts(day.toLong * 86400)
    val evs = Seq(
      // users 1,2 first appear day 0-1 (cohort 0); user 1 returns in
      // week 1, user 2 does not
      (1L, d(0)), (1L, d(8)), (2L, d(1)),
      // user 3 first appears day 7 (cohort 1), active weeks 0 and 2
      (3L, d(7)), (3L, d(22))
    ).toDF("u", "t")
    val out = EventAnalytics.cohortRetention(evs, "u", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // epoch day 0 -> bucket 0; day 7 -> bucket 1
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)))
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))
    assert(out((1L, 2L)) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
  }

  test("cohortRetentionBy: per-(actor, dim) slices equal brute force; " +
      "NULL dimension is a real slice with real retention ratios") {
    def d(day: Int) = ts(day.toLong * 86400)
    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(400) {
      val dim = rnd.nextInt(3) match {
        case 0 => Option.empty[String]
        case i => Some(s"c$i")
      }
      (rnd.nextInt(20).toLong, d(rnd.nextInt(35)), dim)
    }
    // brute force: each (actor, dim) slice anchors at its own first day
    val slices = rows.groupBy(r => (r._1, r._3)).toSeq.map { case ((_, dm), g) =>
      val days = g.map(_._2.getTime / 86400000L)
      val first = days.min
      (dm.orNull, first / 7,
        days.map(dd => (dd - first) / 7).distinct)
    }
    val expSizes = slices.groupBy(s => (s._1, s._2)).view
      .mapValues(_.size.toLong).toMap
    val expCells = slices
      .flatMap { case (dm, c, offs) => offs.map(o => ((dm, c, o), 1L)) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics.cohortRetentionBy(
        rows.toDF("u", "t", "dim"), "u", "t", "dim")
      .collect().map { r =>
        ((if (r.isNullAt(0)) null else r.getString(0)), r.getLong(1),
          r.getLong(2)) ->
          ((r.getLong(3), r.getLong(4), r.getDouble(5)))
      }.toMap
    assert(got.keySet == expCells.keySet)
    got.foreach { case (cell @ (dm, c, _), (n, cs, ret)) =>
      assert(n == expCells(cell), s"cell $cell")
      assert(cs == expSizes((dm, c)), s"size $cell")
      assert(ret == n.toDouble / cs, s"ratio $cell")
    }
    // the hazard pin: null-dim slices really flow through both null-safe
    // joins (a plain-equality join would drop every one of these cells)
    assert(got.keys.exists(_._1 == null))
    intercept[IllegalArgumentException] {
      EventAnalytics.cohortRetentionBy(
        rows.toDF("u", "t", "retention"), "u", "t", "retention")
    }
  }

  test("joinCardinality: exact output size and contributions without " +
      "running the join") {
    val l = Seq((1, "p"), (1, "q"), (2, "r"), (3, "s"), (9, "t"))
      .toDF("k", "pay")
    val r = Seq((1, 10), (1, 11), (1, 12), (2, 20), (4, 40))
      .toDF("k", "v")
    val out = SkewJoin.joinCardinality(l, r, Seq("k"), Seq("k"), k = 10)
      .collect()
    // matching keys 1 (2x3=6) and 2 (1x1=1); total 7 = the REAL join size
    assert(l.join(r, "k").count() == 7L)
    assert(out.length == 2)
    val top = out(0)
    assert(top.getString(0) == "1" && top.getLong(1) == 2 &&
      top.getLong(2) == 3 && top.getDouble(3) == 6.0)
    assert(top.getDouble(4) == 6.0 / 7)
    assert(top.getLong(5) == 2 && top.getDouble(6) == 7.0)
    // null keys match nothing (inner-join semantics)
    val ln = Seq[(Option[Int], Int)]((None, 1), (Some(1), 2)).toDF("k", "x")
    val n = SkewJoin.joinCardinality(ln, r, Seq("k"), Seq("k")).collect()
    assert(n.length == 1 && n(0).getDouble(3) == 3.0) // 1 x 3
    // empty intersection: empty frame, schema intact
    val e = SkewJoin.joinCardinality(
      l.where(col("k") > 100), r, Seq("k"), Seq("k"))
    assert(e.count() == 0 && e.columns.length == 7)
    // CROSS-TYPED keys match exactly as the real join would (native-type
    // equality with Spark's own coercion, not string casts: int 1 must
    // match double 1.0 because left.join(right) matches them)
    val rd = Seq(1.0, 1.0, 2.5).toDF("k")
    assert(l.join(rd, l("k") === rd("k")).count() == 4L)
    val x = SkewJoin.joinCardinality(l, rd, Seq("k"), Seq("k")).collect()
    assert(x.length == 1 && x(0).getDouble(3) == 4.0) // key 1: 2 x 2
  }

  test("funnel property: segmented fold equals brute force across segment " +
      "widths, windows, and a Zipf-hot actor") {
    val rnd = new scala.util.Random(23)
    val steps = Seq("s1", "s2", "s3", "s4")
    // brute-force nested-min with an optional conversion window: step 1 =
    // earliest s1 event; step i = earliest steps(i) event strictly after
    // step i-1, and (windowed) at or before step-1 time + window
    def brute(g: Seq[(Long, Timestamp, String)], w: Long): Seq[Long] = {
      var last = Long.MinValue
      var t0 = Long.MinValue
      var r = 0
      val adv = scala.collection.mutable.ArrayBuffer.empty[Long]
      var advanced = true
      while (advanced && r < steps.size) {
        val cand = g.filter(e => e._3 == steps(r) &&
          (r == 0 || e._2.getTime * 1000 > last) &&
          (w == 0 || r == 0 || e._2.getTime * 1000 <= t0 + w * 1000000L))
          .map(_._2.getTime * 1000)
        if (cand.nonEmpty) {
          last = cand.min
          if (r == 0) t0 = last
          adv += last
          r += 1
        } else advanced = false
      }
      adv.toSeq
    }
    for ((segSec, winSec) <- Seq((1L, 0L), (7L, 0L), (1000000L, 0L),
        (1L, 120L), (13L, 120L), (1000000L, 45L))) {
      // Zipf-ish: actor 0 owns ~25% of all events; 30 light actors
      val rows = Seq.fill(800) {
        val u = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(30).toLong + 1
        (u, ts(rnd.nextInt(600)), s"s${rnd.nextInt(5) + 1}")
      }
      val byUser = rows.groupBy(_._1)
      val expAdv = byUser.map { case (u, g) => u -> brute(g, winSec) }
      val prog = EventAnalytics.actorProgress(rows.toDF("u", "t", "y"),
          "u", "t", "y", steps, winSec, segSec)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Long](1)).toMap
      for ((u, exp) <- expAdv if exp.nonEmpty)
        assert(prog(u) == exp, s"actor $u seg=$segSec win=$winSec")
      for ((u, got) <- prog)
        assert(got == expAdv(u), s"actor $u seg=$segSec win=$winSec")
      // and the count aggregation agrees
      val got = EventAnalytics.funnel(rows.toDF("u", "t", "y"),
          "u", "t", "y", steps, winSec, segSec)
        .collect().map(_.getLong(2)).toSeq
      val expCnt = (1 to steps.size).map(i =>
        expAdv.values.count(_.size >= i).toLong)
      assert(got == expCnt, s"counts seg=$segSec win=$winSec")
    }
  }

  test("funnelBy property: per-dimension counts equal brute force over " +
      "each (actor, dim) slice — NULL dim is a real slice, all k steps " +
      "emitted per dim, ratio conventions match funnel's") {
    val rnd = new scala.util.Random(31)
    val steps = Seq("s1", "s2", "s3")
    def brute(g: Seq[(Timestamp, String)], w: Long): Int = {
      var last = Long.MinValue; var t0 = Long.MinValue; var r = 0
      var advanced = true
      while (advanced && r < steps.size) {
        val cand = g.filter(e => e._2 == steps(r) &&
          (r == 0 || e._1.getTime * 1000 > last) &&
          (w == 0 || r == 0 || e._1.getTime * 1000 <= t0 + w * 1000000L))
          .map(_._1.getTime * 1000)
        if (cand.nonEmpty) {
          last = cand.min; if (r == 0) t0 = last; r += 1
        } else advanced = false
      }
      r
    }
    for ((segSec, winSec) <- Seq((1L, 0L), (86400L, 0L), (7L, 90L))) {
      val rows = Seq.fill(600) {
        val u = rnd.nextInt(20).toLong
        val d = rnd.nextInt(4) match {
          case 0 => Option.empty[String]
          case i => Some(s"d$i")
        }
        (u, ts(rnd.nextInt(500)), s"s${rnd.nextInt(4) + 1}", d)
      }
      // an actor's events split into per-dim slices; each slice funnels
      // independently (the documented varies-per-actor semantics)
      val reached = rows.groupBy(r => (r._1, r._4)).toSeq
        .map { case ((_, d), g) =>
          d -> brute(g.map(e => (e._2, e._3)), winSec)
        }
      val dims = rows.filter(r => steps.contains(r._3)).map(_._4).distinct
      val exp = dims.flatMap { d =>
        val slice = reached.filter(_._1 == d).map(_._2)
        val counts = (1 to steps.size).map(i => slice.count(_ >= i).toLong)
        (1 to steps.size).map { i =>
          val n = counts(i - 1)
          val prev = if (i == 1) n else counts(i - 2)
          (d.orNull, i) -> ((n,
            if (prev == 0L) 0.0 else n.toDouble / prev,
            if (counts(0) == 0L) 0.0 else n.toDouble / counts(0)))
        }
      }.toMap
      val got = EventAnalytics.funnelBy(rows.toDF("u", "t", "y", "dim"),
          "u", "t", "y", "dim", steps, winSec, segSec)
        .collect().map(r => ((if (r.isNullAt(0)) null else r.getString(0)),
          r.getInt(1)) -> ((r.getLong(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      assert(got == exp, s"seg=$segSec win=$winSec")
      // the null slice really occurred and really carries counts
      assert(got.keys.exists(_._1 == null), s"seg=$segSec win=$winSec")
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelBy(Seq((1L, ts(1), "a", "x"))
        .toDF("u", "t", "y", "step"), "u", "t", "y", "step", steps)
    }
  }

  test("funnel auto segments: segmentSeconds = 0 derives the width from " +
      "the observed span and matches brute force on a one-burst bot") {
    val rnd = new scala.util.Random(41)
    // everything happens inside ONE hour: the 86400 s default would put
    // the whole log in a single segment; auto divides the real span
    val rows = Seq.fill(500) {
      val u = if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(20).toLong + 1
      (u, ts(rnd.nextInt(3600)), s"s${rnd.nextInt(4) + 1}")
    }
    val steps = Seq("s1", "s2", "s3")
    val auto = EventAnalytics.funnel(rows.toDF("u", "t", "y"),
      "u", "t", "y", steps, segmentSeconds = 0L)
      .collect().map(_.getLong(2)).toSeq
    val fixed = EventAnalytics.funnel(rows.toDF("u", "t", "y"),
      "u", "t", "y", steps).collect().map(_.getLong(2)).toSeq
    assert(auto == fixed)
    // auto really segments: the DERIVED width divides the observed
    // one-hour span into ~AutoSegments sub-second buckets (pinning the
    // width itself — actor-level parity alone would pass even if auto
    // regressed to one giant segment)
    val micros = EventAnalytics.autoSegmentMicros(rows.toDF("u", "t", "y"),
      "u", "t", "y", steps)
    val spanMicros = {
      val ts = rows.map(_._2.getTime * 1000L)
      ts.max - ts.min + 1
    }
    assert(micros ==
      (spanMicros + EventAnalytics.AutoSegments - 1) /
        EventAnalytics.AutoSegments)
    assert(micros < 1000000L, s"sub-second width expected, got $micros")
    val segged = EventAnalytics.actorProgress(rows.toDF("u", "t", "y"),
      "u", "t", "y", steps, 0L, 0L)
    assert(segged.count() == rows.map(_._1).distinct.size)
    // empty input under auto: no span to derive — still sane
    val e = EventAnalytics.funnel(
      rows.toDF("u", "t", "y").where(col("u") > 999),
      "u", "t", "y", steps, segmentSeconds = 0L).collect()
    assert(e.map(_.getLong(2)).toSeq == Seq(0L, 0L, 0L))
  }

  test("funnel window: steps beyond the deadline are censored; the " +
      "anchor never re-anchors to a later step-1 event") {
    val evs = Seq(
      // user 1: a@10, b@20 inside a 15s window; c@40 beyond it
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(40), "c"),
      // user 2: a@10 (anchor), b@100 outside; the later a@90 must NOT
      // re-anchor even though b@100 would fit its window
      (2L, ts(10), "a"), (2L, ts(90), "a"), (2L, ts(100), "b")
    ).toDF("u", "t", "y")
    val out = EventAnalytics.funnel(evs, "u", "t", "y",
      Seq("a", "b", "c"), windowSeconds = 15L).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L))
    // the deadline is inclusive: b exactly AT t0 + w converts
    val edge = Seq((3L, ts(0), "a"), (3L, ts(15), "b")).toDF("u", "t", "y")
    val e = EventAnalytics.funnel(edge, "u", "t", "y", Seq("a", "b"),
      windowSeconds = 15L).collect()
    assert(e(1).getLong(2) == 1L)
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(evs, "u", "t", "y", Seq("a"),
        windowSeconds = -1L)
    }
  }

  test("funnelStepTiming: exact inter-step medians/p90s; empty steps " +
      "read zero pairs with null quantiles") {
    val evs = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "b"),   // delta a->b = 10
      (2L, ts(0), "a"), (2L, ts(20), "b"),   // delta a->b = 20
      (3L, ts(0), "a"), (3L, ts(40), "b"),   // delta a->b = 40
      (4L, ts(0), "a")                        // never reaches b
    ).toDF("u", "t", "y")
    val out = EventAnalytics.funnelStepTiming(evs, "u", "t", "y",
      Seq("a", "b", "c")).collect()
    assert(out.length == 2)
    assert(out(0).getInt(0) == 2 && out(0).getString(1) == "b" &&
      out(0).getLong(2) == 3L)
    assert(out(0).getDouble(3) == 20.0) // exact median of {10,20,40}
    // p90 at pos 0.9*(3-1)=1.8: 20*(2-1.8) + 40*(1.8-1) = 36.0
    assert(out(0).getDouble(4) == 36.0)
    assert(out(1).getInt(0) == 3 && out(1).getLong(2) == 0L &&
      out(1).isNullAt(3) && out(1).isNullAt(4))
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelStepTiming(evs, "u", "t", "y", Seq("a"))
    }
  }

  test("funnelActors: per-actor reached and advance timestamps; " +
      "non-participants absent; zero-reached actors present") {
    val evs = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"),
      (2L, ts(5), "b"),              // participates (has a step type), r=0
      (3L, ts(1), "x")               // off-funnel only: absent entirely
    ).toDF("u", "t", "y")
    val out = EventAnalytics.funnelActors(evs, "u", "t", "y",
      Seq("a", "b")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    assert(out(1L).getInt(1) == 2 &&
      out(1L).getTimestamp(2) == ts(10) && out(1L).getTimestamp(3) == ts(20))
    assert(out(2L).getInt(1) == 0 &&
      out(2L).isNullAt(2) && out(2L).isNullAt(3))
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelActors(
        evs.withColumnRenamed("u", "reached"), "reached", "t", "y",
        Seq("a", "b"))
    }
  }

  test("nextEventDistribution: successor-row semantics in the total " +
      "order, terminal rows excluded, exact shares") {
    val evs = Seq(
      (1L, ts(1), "a", 1L), (1L, ts(2), "b", 2L), (1L, ts(3), "a", 3L),
      (1L, ts(4), "c", 4L),
      // ties at the same ts resolve by (type, event_id): a@5 then b@5
      (2L, ts(5), "a", 5L), (2L, ts(5), "b", 6L),
      // terminal 'a' (nothing after) contributes nothing
      (3L, ts(9), "a", 7L)
    ).toDF("u", "t", "y", "eid")
    val out = EventAnalytics.nextEventDistribution(evs, "u", "t", "y",
      "a", orderCols = Seq("eid")).collect()
    // successors of 'a': b (u1@1), c (u1@3), b (u2 tie) -> b:2, c:1
    assert(out.map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).toSeq ==
      Seq(("b", 2L, 2.0 / 3), ("c", 1L, 1.0 / 3)))
  }

  test("topEventPaths: overlapping n-grams, gap chain rule, partition " +
      "edges, deterministic top-k") {
    val evs = Seq(
      // user 1: a,b,c,b -> paths (a>b>c), (b>c>b)
      (1L, ts(0), "a", 1L), (1L, ts(10), "b", 2L),
      (1L, ts(20), "c", 3L), (1L, ts(30), "b", 4L),
      // user 2: a,b then a COLD GAP before c: (a>b>c) must NOT form
      // with maxGap=60, but (a>b) chains fine
      (2L, ts(0), "a", 5L), (2L, ts(10), "b", 6L), (2L, ts(500), "c", 7L),
      // user 3: only two events — no complete 3-path
      (3L, ts(0), "a", 8L), (3L, ts(5), "b", 9L)
    ).toDF("u", "t", "y", "eid")
    val out = EventAnalytics.topEventPaths(evs, "u", "t", "y",
      length = 3, k = 5, maxGapSeconds = 60L, orderCols = Seq("eid"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a > b > c", 1L), ("b > c > b", 1L)))
    assert(out.forall(_.getDouble(2) == 0.5))
    // unlimited gap: user 2's path forms too
    val all3 = EventAnalytics.topEventPaths(evs, "u", "t", "y",
      length = 3, k = 5, orderCols = Seq("eid")).collect()
    assert(all3.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a > b > c", 2L), ("b > c > b", 1L)))
    // length-2 paths count every consecutive pair
    val l2 = EventAnalytics.topEventPaths(evs, "u", "t", "y",
      length = 2, k = 100, orderCols = Seq("eid")).collect()
    assert(l2.map(_.getLong(1)).sum == 6L) // 3 + 2 + 1 windows
    intercept[IllegalArgumentException] {
      EventAnalytics.topEventPaths(evs, "u", "t", "y", 1, 5)
    }
    // an unbounded gap would wrap *1000000L negative and silently empty
    // the output — it must fail loudly like windowSeconds does
    intercept[IllegalArgumentException] {
      EventAnalytics.topEventPaths(evs, "u", "t", "y", 2, 5,
        maxGapSeconds = Long.MaxValue / 1000L)
    }
  }

  test("segmented paths property: topEventPaths/nextEventDistribution " +
      "equal brute force across segment widths (incl auto), gap rules, " +
      "lengths, ties, and a hot actor") {
    val rnd = new scala.util.Random(47)
    // thr sweeps the skew split: 1 = every actor segmented, 50 = ONLY
    // the hot actor (~175 events) segmented while the light ones (~18
    // each) take the plain window — the true mixed path —, 10^6 = all
    // light (the pre-r14 shape)
    for ((segSec, gapSec, length, thr) <- Seq(
        (1L, 0L, 3, 1L), (7L, 5L, 3, 50L), (1000000L, 0L, 2, 1L),
        (0L, 9L, 4, 50L), (13L, 0L, 5, 1L), (7L, 5L, 3, 1000000L),
        (1L, 3L, 3, 50L))) {
      // hot actor 0 owns ~25%; coarse ts grid forces same-second ties
      // (broken by type then eid, the documented total order)
      val rows = Seq.tabulate(700) { j =>
        val u = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(30).toLong + 1
        (u, ts(rnd.nextInt(120).toLong), s"e${rnd.nextInt(4)}", j.toLong)
      }
      // brute force: per actor sort by (t, type, eid), windows of
      // `length` consecutive events, gap-filtered
      val paths = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        val s = g.sortBy(e => (e._2.getTime, e._3, e._4))
        s.sliding(length).filter(_.size == length).filter { w =>
          gapSec == 0L || w.sliding(2).forall(p =>
            p(1)._2.getTime - p(0)._2.getTime <= gapSec * 1000L)
        }.map(_.map(_._3).mkString(" > "))
      }
      val expCounts = paths.groupBy(identity).view.mapValues(_.size.toLong)
        .toMap
      val total = paths.size.toDouble
      val got = EventAnalytics.topEventPaths(
          rows.toDF("u", "t", "y", "eid"), "u", "t", "y", length,
          k = 1000000, maxGapSeconds = gapSec, orderCols = Seq("eid"),
          segmentSeconds = segSec, segmentThreshold = thr)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.view.mapValues(_._1).toMap == expCounts,
        s"seg=$segSec gap=$gapSec len=$length thr=$thr")
      got.foreach { case (p, (n, share)) =>
        assert(share == n / total, s"share $p seg=$segSec thr=$thr") }
      // next-event: length-2 windows filtered to the from-type
      if (length == 2 || segSec == 1L) {
        val exp2 = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
          val s = g.sortBy(e => (e._2.getTime, e._3, e._4))
          s.sliding(2).filter(_.size == 2).filter(_(0)._3 == "e1")
            .map(_(1)._3)
        }
        val expDist = exp2.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        val gotDist = EventAnalytics.nextEventDistribution(
            rows.toDF("u", "t", "y", "eid"), "u", "t", "y", "e1",
            orderCols = Seq("eid"), segmentSeconds = segSec,
            segmentThreshold = thr)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(gotDist == expDist, s"nextEvent seg=$segSec thr=$thr")
      }
    }
  }

  test("eventTransitionMatrix: brute-force parity across split regimes; " +
      "each from-type row equals nextEventDistribution; shares " +
      "row-normalize to 1") {
    val rnd = new scala.util.Random(59)
    val rows = Seq.tabulate(600) { j =>
      val u = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(25).toLong + 1
      (u, ts(rnd.nextInt(200).toLong), s"e${rnd.nextInt(4)}", j.toLong)
    }
    val exp = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(e => (e._2.getTime, e._3, e._4)).sliding(2)
        .filter(_.size == 2).map(p => (p(0)._3, p(1)._3))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (thr <- Seq(1L, 30L, 1000000L)) {
      val got = EventAnalytics.eventTransitionMatrix(
          rows.toDF("u", "t", "y", "eid"), "u", "t", "y",
          orderCols = Seq("eid"), segmentThreshold = thr)
        .collect()
      val counts = got.map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(counts == exp, s"thr=$thr")
      // shares row-normalize: each from_type's shares sum to 1
      got.groupBy(_.getString(0)).foreach { case (f, rs) =>
        assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-12,
          s"row $f thr=$thr")
      }
      // the e1 row of the matrix IS nextEventDistribution("e1")
      val row1 = got.filter(_.getString(0) == "e1")
        .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val ned = EventAnalytics.nextEventDistribution(
          rows.toDF("u", "t", "y", "eid"), "u", "t", "y", "e1",
          orderCols = Seq("eid"), segmentThreshold = thr)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(row1 == ned, s"thr=$thr")
    }
  }

  test("funnel: internal aliases do not collide with user column names") {
    val evs = Seq((1L, ts(1), "a"), (1L, ts(2), "b"))
      .toDF("evs", "r", "last")
    val out = EventAnalytics.funnel(evs, "evs", "r", "last",
      Seq("a", "b")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("eventTransitionMatrixBy / topEventPathsBy: each dimension slice " +
      "equals the plain op over that slice alone, across split regimes " +
      "(NULL slice and event-level dimensions included)") {
    val rnd = new scala.util.Random(20250819)
    // actor 0 is HOT (~60% of events): thr = 50 then routes actor 0's
    // slices heavy while the other actors' slices stay light — a
    // genuinely MIXED regime where light and heavy rows coexist in the
    // union (thr = 1e6 all-light, thr = 3 all-heavy)
    val rows = (0 until 600).map { i =>
      val dim: Option[String] = rnd.nextInt(3) match {
        case 0 => None
        case n => Some(s"d$n")
      }
      val actor = rnd.nextInt(10) match {
        case n if n < 6 => 0L
        case n => (n - 5).toLong
      }
      (actor, ts(rnd.nextInt(4000).toLong),
        s"${(97 + rnd.nextInt(4)).toChar}", dim, i)
    }
    val df = rows.map { case (u, t, y, d, i) => (u, t, y, d.orNull, i) }
      .toDF("u", "t", "y", "dim", "eid")
    val dims = rows.map(_._4).distinct
    // pin the mixed regime: some (actor, dim) slices above thr=50, some
    // below
    val sliceCounts = rows.groupBy(r => (r._1, r._4)).map(_._2.size)
    assert(sliceCounts.exists(_ > 50) && sliceCounts.exists(_ <= 50),
      "fixture must produce a mixed regime at thr=50")
    for (thr <- Seq(1000000L, 50L, 3L)) {
      val mat = EventAnalytics.eventTransitionMatrixBy(df, "u", "t", "y",
          "dim", orderCols = Seq("eid"), segmentSeconds = 600L,
          segmentThreshold = thr)
        .collect()
        .map(r => (Option(r.getString(0)), r.getString(1),
          r.getString(2)) -> ((r.getLong(3), r.getDouble(4)))).toMap
      val paths = EventAnalytics.topEventPathsBy(df, "u", "t", "y",
          "dim", length = 3, k = 1000, maxGapSeconds = 900L,
          orderCols = Seq("eid"), segmentSeconds = 600L,
          segmentThreshold = thr)
        .collect()
        .map(r => (Option(r.getString(0)), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
      var matCells = 0; var pathCells = 0
      dims.foreach { d =>
        val slice = df.where(if (d.isEmpty) col("dim").isNull
          else col("dim") === d.get)
        val soloM = EventAnalytics.eventTransitionMatrix(slice, "u", "t",
            "y", orderCols = Seq("eid"), segmentSeconds = 600L,
            segmentThreshold = thr)
          .collect()
          .map(r => (d, r.getString(0), r.getString(1)) ->
            ((r.getLong(2), r.getDouble(3)))).toMap
        soloM.foreach { case (key, v) =>
          assert(mat(key) == v, s"thr=$thr matrix $key") }
        matCells += soloM.size
        val soloP = EventAnalytics.topEventPaths(slice, "u", "t", "y",
            length = 3, k = 1000, maxGapSeconds = 900L,
            orderCols = Seq("eid"), segmentSeconds = 600L,
            segmentThreshold = thr)
          .collect().zipWithIndex
          .map { case (r, i) => (d, r.getString(0)) ->
            ((r.getLong(1), r.getDouble(2), i + 1)) }.toMap
        soloP.foreach { case (key, v) =>
          assert(paths(key) == v, s"thr=$thr paths $key") }
        pathCells += soloP.size
      }
      assert(mat.size == matCells, s"thr=$thr extra matrix cells")
      assert(paths.size == pathCells, s"thr=$thr extra path cells")
    }
  }

  test("funnelStepTimingBy: each dimension slice equals funnelStepTiming " +
      "over that slice alone (NULL slice included, windowed arm too)") {
    val rnd = new scala.util.Random(20250817)
    val steps = Seq("a", "b", "c")
    val rows = (0 until 500).map { i =>
      val dim: Option[String] = rnd.nextInt(3) match {
        case 0 => None
        case n => Some(s"d$n")
      }
      (rnd.nextInt(40).toLong, ts(rnd.nextInt(5000).toLong),
        s"${(97 + rnd.nextInt(4)).toChar}", dim, i)
    }
    val df = rows.map { case (u, t, y, d, i) => (u, t, y, d.orNull, i) }
      .toDF("u", "t", "y", "dim", "eid")
    for (win <- Seq(0L, 900L)) {
      val by = EventAnalytics.funnelStepTimingBy(df, "u", "t", "y", "dim",
          steps, windowSeconds = win)
        .collect()
        .map(r => (Option(r.getString(0)), r.getInt(1)) ->
          ((r.getString(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)),
            if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
      val dims = rows.map(_._4).distinct
      val expectedRows = dims.size * (steps.size - 1)
      assert(by.size == expectedRows, s"win=$win grid size")
      dims.foreach { d =>
        // the slice: an actor participates in a dimension with exactly
        // its events carrying that dimension value (null-safe)
        val slice = df.where(if (d.isEmpty) col("dim").isNull
          else col("dim") === d.get)
        val solo = EventAnalytics.funnelStepTiming(slice, "u", "t", "y",
            steps, windowSeconds = win)
          .collect()
          .map(r => (d, r.getInt(0)) -> ((r.getString(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
        solo.foreach { case (k, v) =>
          assert(by(k) == v, s"win=$win dim=$d step=${k._2}: " +
            s"got ${by(k)}, want $v")
        }
      }
    }
  }
}
