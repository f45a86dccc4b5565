package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-twin equivalence for event paths: replaying a log through
  * micro-batches IN EVENT-TIME ORDER must emit path hits whose counts
  * equal [[EventAnalytics.topEventPaths]] over the same log — and
  * cross-batch disorder must DROP late events (under-count) rather than
  * chain paths in arrival order (fabrication).
  */
class StreamingPathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streamingPaths replayed in event-time order equals the batch " +
      "path counts, with and without the gap rule") {
    val rnd = new scala.util.Random(53)
    // unique timestamps: the twin has no orderCols arm, so ties are the
    // caller's ambiguity in both forms
    val times = rnd.shuffle((1 to 400).toList)
    val events = times.map(t => (rnd.nextInt(25).toLong,
      ts(t.toLong), s"s${rnd.nextInt(4) + 1}"))
    for (gap <- Seq(0L, 25L)) {
      val ordered = events.sortBy(_._2.getTime)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp, String)]
      val out = StreamingFrame.streamingPaths(
        mem.toDF.toDF("u", "t", "y"), "u", "t", "y", length = 3,
        maxGapSeconds = gap)
      val name = s"paths_twin_$gap"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      ordered.grouped(90).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      q.stop()
      val streamed = spark.sql(
        s"SELECT path, count(*) n FROM $name GROUP BY 1").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = EventAnalytics.topEventPaths(events.toDF("u", "t", "y"),
        "u", "t", "y", length = 3, k = 1000000, maxGapSeconds = gap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"gap=$gap")
    }
    // same loud-failure bound as the batch twin: a wrapping gap must
    // throw, not silently drop every path
    intercept[IllegalArgumentException] {
      StreamingFrame.streamingPaths(
        events.toDF("u", "t", "y"), "u", "t", "y", length = 2,
        maxGapSeconds = Long.MaxValue / 1000L)
    }
  }

  test("late events are dropped, never chained in arrival order; " +
      "envelope round-trips exotic types and rejects config changes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingPaths(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y", length = 2)
    val q = out.writeStream.format("memory").queryName("paths_late")
      .outputMode("update").start()
    // a@10, c@30 arrive; then b@20 late: arrival-order chaining would
    // fabricate (c > b) — the drop rule forbids it
    mem.addData(Seq((1L, ts(10), "a"), (1L, ts(30), "c")))
    q.processAllAvailable()
    mem.addData(Seq((1L, ts(20), "b")))
    q.processAllAvailable()
    q.stop()
    val paths = spark.sql("SELECT path FROM paths_late").collect()
      .map(_.getString(0)).toSeq.sorted
    assert(paths == Seq("a > c")) // batch would read a>b, b>c; NEVER c>b
    // cross-batch TIE below the frontier: (t=40,"a") after (t=40,"b")
    // is as late as an earlier timestamp — chaining it would order the
    // tie by arrival, which the batch (ts, type) order never does
    val mem2 = MemoryStream[(Long, Timestamp, String)]
    val out2 = StreamingFrame.streamingPaths(
      mem2.toDF.toDF("u", "t", "y"), "u", "t", "y", length = 2)
    val q2 = out2.writeStream.format("memory").queryName("paths_tie")
      .outputMode("update").start()
    mem2.addData(Seq((1L, ts(40), "b")))
    q2.processAllAvailable()
    mem2.addData(Seq((1L, ts(40), "a")))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.sql("SELECT count(*) FROM paths_tie").head().getLong(0)
      == 0L) // "b > a" would invert the batch tie order
    // envelope: quotes/backslashes in types survive the JSON round-trip
    val evs = Seq(5L -> """say "hi"\now""", 9L -> "plain")
    val e = StreamingFrame.StateEnvelope.encodePaths(3, 60L, evs)
    assert(StreamingFrame.StateEnvelope.decodePaths(e, 3, 60L) == evs)
    intercept[StreamingFrame.StateEnvelope.PathsConfigMismatch] {
      StreamingFrame.StateEnvelope.decodePaths(e, 4, 60L)
    }
    intercept[StreamingFrame.StateEnvelope.PathsConfigMismatch] {
      StreamingFrame.StateEnvelope.decodePaths(e, 3, 0L)
    }
    intercept[IllegalStateException] {
      StreamingFrame.StateEnvelope.decodePaths(e.copy(version = 99), 3, 60L)
    }
  }
}
