package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-twin equivalence for the transition matrix: replaying a log
  * through micro-batches IN EVENT-TIME ORDER, the emitted (from, next)
  * pairs run through the batch op's OWN `transitionShares` projection
  * must equal [[EventAnalytics.eventTransitionMatrix]] over the same log
  * — and cross-batch disorder must drop late events, never chain pairs
  * in arrival order.
  */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streamingTransitions replayed in event-time order + the shared " +
      "transitionShares projection equals the batch matrix") {
    val rnd = new scala.util.Random(54)
    // unique timestamps: the twin has no orderCols arm, so ties are the
    // caller's ambiguity in both forms
    val times = rnd.shuffle((1 to 400).toList)
    val events = times.map(t => (rnd.nextInt(25).toLong,
      ts(t.toLong), s"s${rnd.nextInt(4) + 1}"))
    val ordered = events.sortBy(_._2.getTime)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingTransitions(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y")
    val q = out.writeStream.format("memory").queryName("trans_twin")
      .outputMode("update").start()
    ordered.grouped(90).foreach { b =>
      mem.addData(b); q.processAllAvailable()
    }
    q.stop()
    val streamed = EventAnalytics.transitionShares(
        spark.table("trans_twin").select("from_type", "next_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val batch = EventAnalytics.eventTransitionMatrix(
        events.toDF("u", "t", "y"), "u", "t", "y")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed == batch)
  }

  test("late events drop (never chain in arrival order); state is the " +
      "length-2 paths payload — other configs fail loudly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingTransitions(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y")
    val q = out.writeStream.format("memory").queryName("trans_late")
      .outputMode("update").start()
    // a@10, c@30 arrive; then b@20 late: arrival-order chaining would
    // fabricate (c, b) — the drop rule forbids it
    mem.addData(Seq((1L, ts(10), "a"), (1L, ts(30), "c")))
    q.processAllAvailable()
    mem.addData(Seq((1L, ts(20), "b")))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql(
        "SELECT from_type, next_type FROM trans_late").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs == Seq(("a", "c"))) // batch: (a,b),(b,c); NEVER (c,b)
    // the envelope is the length-2 paths payload: a payload written for
    // a different (length, gap) config must fail loudly on resume
    val foreign = StreamingFrame.StateEnvelope.encodePaths(3, 0L,
      Seq(1000L -> "a", 2000L -> "b"))
    intercept[StreamingFrame.StateEnvelope.PathsConfigMismatch] {
      StreamingFrame.StateEnvelope.decodePaths(foreign, 2, 0L)
    }
    val gapForeign = StreamingFrame.StateEnvelope.encodePaths(2, 60L,
      Seq(1000L -> "a"))
    intercept[StreamingFrame.StateEnvelope.PathsConfigMismatch] {
      StreamingFrame.StateEnvelope.decodePaths(gapForeign, 2, 0L)
    }
  }
}
