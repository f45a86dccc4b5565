package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** As-of join semantics on controlled fixtures: backward match, inclusive
  * vs strict ties, unmatched rows, null keys/times never matching.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:10"), 101.0),
    (1L, ts("2024-01-01 10:00:20"), 102.0),
    (2L, ts("2024-01-01 10:00:05"), 200.0)
  ).toDF("key", "qts", "price")

  private def trades = Seq(
    (10L, 1L, ts("2024-01-01 10:00:15")), // between quotes 2 and 3 -> 101
    (11L, 1L, ts("2024-01-01 10:00:10")), // tie with quote 2
    (12L, 1L, ts("2024-01-01 09:59:59")), // before any quote -> null
    (13L, 2L, ts("2024-01-01 11:00:00")), // key 2 -> 200
    (14L, 3L, ts("2024-01-01 12:00:00"))  // no quotes for key 3 -> null
  ).toDF("trade_id", "key", "tts")

  test("backward inclusive: latest quote at or before each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price")).collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("price_right"))).toMap
    assert(out(10L).contains(101.0))
    assert(out(11L).contains(101.0)) // tie matches inclusively
    assert(out(12L).isEmpty)
    assert(out(13L).contains(200.0))
    assert(out(14L).isEmpty)
    assert(out.size == 5)
  }

  test("strict: equal timestamps do not match") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price"), strict = true).collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("price_right"))).toMap
    assert(out(11L).contains(100.0)) // 10:00:10 quote excluded under >
    assert(out(10L).contains(101.0)) // unaffected
  }

  test("null right keys/times never match; left rows survive") {
    val q = quotes.unionByName(Seq(
      (0L, null.asInstanceOf[Timestamp], 999.0)).toDF("key", "qts", "price"))
    val t = Seq((20L, 0L, ts("2024-01-01 10:00:30"))).toDF("trade_id", "key", "tts")
    val out = AsofJoin.asofJoin(t, q, Seq("key"), "tts", "qts", Seq("price"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("price_right")))
  }

  test("range join: bin-bucketed candidates equal the exact BETWEEN join") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.37)).toDF("pid", "x")
    val ivs = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 5.5, 70.0),
      (4L, 80.0, 80.0)).toDF("iv_id", "lo", "hi")
    val got = graft.ops.RangeJoin.pointInInterval(points, "x", ivs,
      "lo", "hi", binWidth = 7.0)
      .select("pid", "iv_id_iv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = points.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
    // no duplicate candidates: exact count match too
    assert(graft.ops.RangeJoin.pointInInterval(points, "x", ivs,
      "lo", "hi", binWidth = 7.0).count() == expected.size)
  }

  test("multiple right values arrive together, suffixed") {
    val q = quotes.withColumn("venue", concat(lit("v"), col("key")))
    val out = AsofJoin.asofJoin(trades.where(col("trade_id") === 13L), q,
      Seq("key"), "tts", "qts", Seq("price", "venue")).head()
    assert(out.getAs[Double]("price_right") == 200.0)
    assert(out.getAs[String]("venue_right") == "v2")
  }

  // ---- r16 skew-split coverage -------------------------------------

  private def usTs(us: Long) = new Timestamp(us / 1000L)

  /** Random two-sided fixture with a hot key, null keys, null left times,
    * and tie timestamps; brute-force reference computed per (strict, key).
    */
  test("skew-split parity: every routing regime equals brute force " +
      "(widths, AUTO, allHeavy, Known, strict, ties, null slices)") {
    val rnd = new scala.util.Random(4242)
    // key 1 is hot (~60% of rows); keys 0/None cold; times on a 1s grid
    // so ties happen — but right (key, t) pairs are deduped to keep the
    // match deterministic (the documented ambiguity carve-out)
    def key(): Option[Long] = rnd.nextInt(10) match {
      case 0 => None
      case n if n <= 6 => Some(1L)
      case n => Some(n.toLong % 3)
    }
    val lrows = (0L until 300L).map { id =>
      val t = if (rnd.nextInt(12) == 0) None
        else Some(rnd.nextInt(3000).toLong * 1000000L)
      (id, key(), t)
    }
    val rrowsRaw = (0L until 250L).map { id =>
      (id, key(), Some(rnd.nextInt(3000).toLong * 1000000L),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(999) * 1.0))
    }
    // dedupe right on (key, t) for non-null keys only: keep max id
    // (deterministic match target); NULL-KEY right rows stay in the
    // frame — the operator must filter them on every path, and they can
    // never match, so duplicates among them are harmless
    val rrows = rrowsRaw.groupBy(r => (r._2, r._3))
      .flatMap { case ((k, _), g) =>
        if (k.isDefined) Seq(g.maxBy(_._1)) else g }.toSeq
    val left = lrows.map { case (id, k, t) =>
      (id, k.map(java.lang.Long.valueOf).orNull,
        t.map(usTs).orNull)
    }.toDF("lid", "key", "tts")
    val right = rrows.map { case (id, k, t, v) =>
      (id, k.map(java.lang.Long.valueOf).orNull, t.map(usTs).orNull,
        v.map(java.lang.Double.valueOf).orNull)
    }.toDF("rid", "key", "qts", "price")
    def reference(strict: Boolean, dir: String, tolS: Long)
        : Map[Long, Option[(Long, Option[Double])]] =
      lrows.map { case (id, k, t) =>
        def pick(kk: Long, tt: Long, forward: Boolean)
            : Option[(Long, Option[Double], Long)] = {
          val cand = rrows.filter { r =>
            r._2.contains(kk) && {
              val rt = r._3.get
              if (forward) { if (strict) rt > tt else rt >= tt }
              else { if (strict) rt < tt else rt <= tt }
            }
          }
          if (cand.isEmpty) None
          else {
            val best =
              if (forward) cand.minBy(r => (r._3.get, -r._1))
              else cand.maxBy(r => (r._3.get, r._1))
            val gap = if (forward) best._3.get - tt else tt - best._3.get
            if (tolS > 0 && gap > tolS * 1000000L) None
            else Some((best._1, best._4, gap))
          }
        }
        val m = (k, t) match {
          case (Some(kk), Some(tt)) =>
            (dir match {
              case "nearest" =>
                (pick(kk, tt, forward = false),
                  pick(kk, tt, forward = true)) match {
                  case (Some(b), Some(f)) =>
                    if (b._3 <= f._3) Some(b) else Some(f) // tie: backward
                  case (b, f) => b.orElse(f)
                }
              case "forward" => pick(kk, tt, forward = true)
              case _ => pick(kk, tt, forward = false)
            }).map(r => (r._1, r._2))
          case _ => None
        }
        id -> m
      }.toMap
    val detected = ops.HeavySplit.detect(left.unionByName(
      right.select(col("rid").as("lid"), col("key"),
        col("qts").as("tts"))), "key", "tts", 50L)
    assert(detected.keys.nonEmpty, "fixture must produce heavy keys")
    val configs: Seq[(Long, Long, ops.HeavySplit)] = Seq(
      (86400L, 1000000L, ops.HeavySplit.Detect), // all light
      (1L, 1L, ops.HeavySplit.Detect), // everything heavy, many segments
      (0L, 5L, ops.HeavySplit.Detect), // AUTO width
      (1L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true)),
      (7L, 1L, ops.HeavySplit.Known(Nil, allHeavy = true,
        maxSpanMicros = Some(3000L * 1000000L))),
      (60L, 50L, detected))
    // the full strict × direction × tolerance matrix runs on a reduced
    // regime set; the full regime set runs on the default arm
    val smallConfigs = Seq(configs.head, configs(3), configs.last)
    for (strict <- Seq(false, true);
         dir <- Seq("backward", "forward", "nearest");
         tolS <- Seq(0L, 300L);
         (segS, thr, split) <-
           (if (!strict && dir == "backward" && tolS == 0L) configs
            else smallConfigs)) {
      val out = AsofJoin.asofJoin(left, right, Seq("key"), "tts", "qts",
          Seq("rid", "price"), strict = strict,
          direction = dir,
          toleranceSeconds = tolS, segmentSeconds = segS,
          segmentThreshold = thr, split = split)
        .select("lid", "rid_right", "price_right").collect()
      val tag = s"($segS,$thr,$split,strict=$strict,dir=$dir,tol=$tolS)"
      assert(out.length == lrows.size, s"row count under $tag")
      val want = reference(strict, dir, tolS)
      out.foreach { r =>
        val lid = r.getLong(0)
        val got =
          if (r.isNullAt(1)) None
          else Some((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        assert(got == want(lid),
          s"lid $lid under $tag: got $got, want ${want(lid)}")
      }
    }
  }

  test("composite keys: hash-routed heavy split equals the light path " +
      "(window partitions on the REAL key columns)") {
    val rnd = new scala.util.Random(7)
    val left = (0L until 200L).map { id =>
      (id, rnd.nextInt(2).toLong, s"v${rnd.nextInt(2)}",
        usTs(rnd.nextInt(500).toLong * 1000000L))
    }.toDF("lid", "k1", "k2", "tts")
    val right = (0L until 150L).map { id =>
      (id, rnd.nextInt(2).toLong, s"v${rnd.nextInt(2)}",
        usTs(rnd.nextInt(500).toLong * 1000000L), rnd.nextInt(100) * 1.0)
    }.toDF("rid", "k1", "k2", "qts", "price")
    def run(split: ops.HeavySplit) =
      AsofJoin.asofJoin(left, right, Seq("k1", "k2"), "tts", "qts",
          Seq("rid"), segmentSeconds = 30L, segmentThreshold = 10L,
          split = split)
        .select("lid", "rid_right").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val lightRef = run(ops.HeavySplit.AssumeLight)
    val heavy = run(ops.HeavySplit.Known(Nil, allHeavy = true))
    val detect = run(ops.HeavySplit.Detect)
    assert(heavy == lightRef && detect == lightRef && lightRef.size == 200)
  }

  test("non-time left time column (numeric sequence) keeps the plain " +
      "window — no split, same results as before r16") {
    val left = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("lid", "key", "seq")
    val right = Seq((100L, 1L, 5L, 1.5), (101L, 1L, 15L, 2.5))
      .toDF("rid", "key", "rseq", "price")
    val out = AsofJoin.asofJoin(left, right, Seq("key"), "seq", "rseq",
        Seq("price"), split = ops.HeavySplit.Known(Nil, allHeavy = true))
      .select("lid", "price_right").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 1.5, 2L -> 2.5))
    // forward over numeric sequences: negation reflection
    val fwd = AsofJoin.asofJoin(left, right, Seq("key"), "seq", "rseq",
        Seq("price"), direction = "forward")
      .select("lid", "price_right").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(fwd == Map(1L -> Some(2.5), 2L -> None))
    // tolerance needs a clock: numeric time columns are loud
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("key"), "seq", "rseq",
        Seq("price"), toleranceSeconds = 60L)
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("key"), "seq", "rseq",
        Seq("price"), direction = "sideways")
    }
  }

  test("plan: heavy asofJoin — ONE fill window, sorts lead with " +
      "(key, segment), state map-side-combines (partial_max_by)") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("lid", "key", "tts")
    val right = Seq((9L, 1L, ts("2024-01-01 09:00:00"), 1.0))
      .toDF("rid", "key", "qts", "price")
    val plan = AsofJoin.asofJoin(left, right, Seq("key"), "tts", "qts",
        Seq("price"), segmentSeconds = 60L,
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
      assert(cs.head.startsWith("key#") && cs(1).startsWith("__seg"),
        s"sort must lead with (key, segment), got: $s\n$plan")
    }
  }
}
