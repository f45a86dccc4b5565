package graft

import java.sql.Timestamp

import graft.stats.ValueCounts
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-twin equivalence for per-group top values: each CLOSED
  * event-time window's emitted counts, ranked through the SHARED
  * [[ValueCounts.rankValueCounts]] stage, must equal
  * [[ValueCounts.topValuesByGroup]] over the same window's rows — and
  * late rows beyond the watermark drop (under-count only, never
  * fabrication).
  */
class StreamingTopValuesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streamingTopValues closed windows, ranked by the shared stage, " +
      "equal batch topValuesByGroup per window") {
    val rnd = new scala.util.Random(29)
    // two 1-hour windows, 3 groups x 6 values, deliberate rank ties
    val rows = Seq.fill(400)((s"g${rnd.nextInt(3)}", s"v${rnd.nextInt(6)}",
      ts(rnd.nextInt(7200).toLong)))
    val ordered = rows.sortBy(_._3.getTime)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val out = StreamingFrame.streamingTopValues(
      mem.toDF.toDF("g", "v", "t"), "t", Seq("g"), "v",
      windowDuration = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("tv_twin")
      .outputMode("append").start()
    ordered.grouped(100).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    // sentinel far past both windows: advances the watermark so they
    // close and emit (its own window never closes — never emitted)
    mem.addData(Seq(("gx", "vx", ts(1000000L))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT * FROM tv_twin").collect()
    val starts = streamed.map(_.getTimestamp(0)).distinct
    assert(starts.length == 2)
    assert(!streamed.exists(_.getString(2) == "gx"))
    // the scaladoc's prescribed composition: window PREPENDED to the
    // group columns scopes rank and share per closed window over the
    // whole emitted frame in one call
    val composed = ValueCounts.rankValueCounts(
      spark.sql("SELECT window_start, g, value, n FROM tv_twin"),
      Seq("window_start", "g"), k = 3, checkCollapsed = true).collect()
      .groupBy(_.getTimestamp(0))
      .map { case (ws, rs) => ws -> rs.map(r => (r.getString(1),
        r.getString(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toSet }
    for (ws <- starts) {
      val we = ws.getTime + 3600000L
      val counts = streamed.filter(_.getTimestamp(0) == ws)
        .map(r => (r.getString(2), r.getString(3), r.getLong(4))).toSeq
        .toDF("g", "value", "n")
      val ranked = ValueCounts.rankValueCounts(counts, Seq("g"), k = 3)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getInt(4))).toSeq
      val batchIn = rows
        .filter(r => r._3.getTime >= ws.getTime && r._3.getTime < we)
        .toDF("g", "v", "t")
      val batch = ValueCounts.topValuesByGroup(batchIn, Seq("g"), "v",
          k = 3).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getInt(4))).toSeq
      assert(ranked == batch, s"window $ws")
      assert(composed(ws) == batch.toSet, s"composed window $ws")
    }
  }

  test("late rows beyond the watermark drop: a closed window only " +
      "under-counts, never re-opens or fabricates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val out = StreamingFrame.streamingTopValues(
      mem.toDF.toDF("g", "v", "t"), "t", Seq("g"), "v",
      windowDuration = "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("tv_late")
      .outputMode("append").start()
    mem.addData(Seq(("gA", "v1", ts(3000)), ("gA", "v1", ts(5000))))
    q.processAllAvailable()   // watermark 5000s - 600s > window-0 end
    mem.addData(Seq(("gA", "v2", ts(100)))) // late into window 0: DROPPED
    q.processAllAvailable()
    mem.addData(Seq(("gx", "vx", ts(1000000L))))
    q.processAllAvailable()
    q.stop()
    val w0 = spark.sql(
      "SELECT value, n FROM tv_late WHERE window_start = timestamp'1970-01-01 00:00:00'")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w0 == Map("v1" -> 1L)) // v2 never lands; no re-emission
    intercept[IllegalArgumentException] {
      StreamingFrame.streamingTopValues(
        mem.toDF.toDF("value", "v", "t"), "t", Seq("value"), "v")
    }
  }
  test("rankValueCounts checkCollapsed: ranking emissions WITHOUT the " +
      "window key fails loudly instead of silently splitting counts") {
    import graft.stats.ValueCounts
    // two windows' emissions for the same (g, value): collapsed under
    // (window, g) but DUPLICATE under (g) alone — the canonical misuse
    val emitted = Seq(
      (1L, "g1", "a", 3L), (2L, "g1", "a", 5L), (2L, "g1", "b", 1L)
    ).toDF("window_start", "g", "value", "n")
    // with the window key: fine (guard on)
    val ok = ValueCounts.rankValueCounts(emitted,
      Seq("window_start", "g"), k = 2, checkCollapsed = true).collect()
    assert(ok.length == 3)
    // without it: the guard throws with the diagnostic
    val e = intercept[Exception] {
      ValueCounts.rankValueCounts(emitted.select("g", "value", "n"),
        Seq("g"), k = 2, checkCollapsed = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not pre-collapsed")), e.toString)
    // and without the guard the misuse is the documented silent one:
    // duplicate ranked rows for the same value
    val silent = ValueCounts.rankValueCounts(
      emitted.select("g", "value", "n"), Seq("g"), k = 3).collect()
    assert(silent.count(r => r.getString(1) == "a") == 2)
  }
}
