package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-twin equivalence for the funnel: replaying an event log
  * through micro-batches IN EVENT-TIME ORDER must leave per-actor funnel
  * states whose step counts equal [[EventAnalytics.funnel]] over the same
  * log — and the documented cross-batch-disorder caveat must under-count,
  * never over-count.
  */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val steps = Seq("a", "b", "c")

  test("streamingFunnel replayed in event-time order equals the batch " +
      "funnel step counts") {
    val rnd = new scala.util.Random(7)
    val events = Seq.fill(400)((rnd.nextInt(40).toLong,
      ts(rnd.nextInt(500)), s"${('a' + rnd.nextInt(4)).toChar}"))
    val ordered = events.sortBy(e => (e._2.getTime, e._3))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingFunnel(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y", steps)
    val q = out.writeStream.format("memory").queryName("funnel_twin")
      .outputMode("update").start()
    // feed in event-time order across several micro-batches
    ordered.grouped(90).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    // final state per actor = last update emitted for it
    val streamed = spark.sql(
      "SELECT actor, reached FROM funnel_twin").collect()
      .groupBy(_.getString(0))
      .map { case (_, rows) => rows.map(_.getInt(1)).max }
    val streamCounts = (1 to steps.size).map(i =>
      streamed.count(_ >= i).toLong)
    val batchCounts = EventAnalytics.funnel(
      events.toDF("u", "t", "y"), "u", "t", "y", steps)
      .collect().map(_.getLong(2)).toSeq
    assert(streamCounts == batchCounts)
  }

  test("streamingFunnelBy replayed in event-time order equals batch " +
      "funnelBy per-dimension counts — NULL dimension a real slice, " +
      "shared fold, same envelope") {
    val rnd = new scala.util.Random(13)
    val events = Seq.fill(500) {
      val dim = rnd.nextInt(3) match {
        case 0 => Option.empty[String]
        case i => Some(s"d$i")
      }
      (rnd.nextInt(30).toLong, ts(rnd.nextInt(400)),
        s"${('a' + rnd.nextInt(4)).toChar}", dim)
    }
    val ordered = events.sortBy(e => (e._2.getTime, e._3))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Option[String])]
    val out = StreamingFrame.streamingFunnelBy(
      mem.toDF.toDF("u", "t", "y", "dim"), "u", "t", "y", "dim", steps)
    val q = out.writeStream.format("memory").queryName("funnelby_twin")
      .outputMode("update").start()
    ordered.grouped(120).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    // final per-(actor, dim) frontier -> per-(dim, step) actor counts
    val streamed = spark.sql(
      "SELECT actor, dim, max(reached) r FROM funnelby_twin GROUP BY 1, 2")
      .collect()
      .groupBy(r => if (r.isNullAt(1)) null else r.getString(1))
      .map { case (dm, rows) =>
        dm -> (1 to steps.size).map(i =>
          rows.count(_.getAs[Int]("r") >= i).toLong)
      }
    val batch = EventAnalytics.funnelBy(
        events.toDF("u", "t", "y", "dim"), "u", "t", "y", "dim", steps)
      .collect()
      .groupBy(r => if (r.isNullAt(0)) null else r.getString(0))
      .map { case (dm, rows) =>
        dm -> rows.sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
      }
    assert(streamed.keySet == batch.keySet)
    assert(streamed.keySet.contains(null)) // the null slice is live
    batch.foreach { case (dm, counts) =>
      assert(streamed(dm) == counts, s"dim $dm")
    }
  }

  test("cross-batch disorder under-counts, never over-counts; state " +
      "envelope round-trips and rejects unknown versions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingFunnel(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y", Seq("a", "b"))
    val q = out.writeStream.format("memory").queryName("funnel_late")
      .outputMode("update").start()
    // the successor step arrives a batch BEFORE its predecessor: the
    // frontier state cannot retroactively use the already-seen 'b'
    mem.addData(Seq((1L, ts(20), "b")))
    q.processAllAvailable()
    mem.addData(Seq((1L, ts(10), "a")))
    q.processAllAvailable()
    q.stop()
    val r = spark.sql(
      "SELECT max(reached) FROM funnel_late WHERE actor = '1'").head()
    assert(r.getInt(0) == 1) // batch order would read 2; late data: 1
    // envelope: exact round-trip, loud unknown version, loud STEPS
    // mismatch, loud WINDOW mismatch — progress embodies the deadlines
    // it was (or was not) measured against
    val e = StreamingFrame.StateEnvelope.encodeFunnel(3, 2, 123456789L,
      100000L, 60L)
    assert(StreamingFrame.StateEnvelope.decodeFunnel(e, 3, 60L) ==
      ((2, 123456789L, 100000L)))
    intercept[IllegalStateException] {
      StreamingFrame.StateEnvelope.decodeFunnel(e.copy(version = 99), 3,
        60L)
    }
    intercept[StreamingFrame.StateEnvelope.FunnelConfigMismatch] {
      StreamingFrame.StateEnvelope.decodeFunnel(e, 2, 60L)
    }
    intercept[StreamingFrame.StateEnvelope.FunnelWindowMismatch] {
      StreamingFrame.StateEnvelope.decodeFunnel(e, 3, 0L)
    }
    // v1 upgrade arm: an unwindowed resume decodes (anchor = last, dead
    // state); a WINDOWED resume of pre-window state must fail loudly —
    // its progress never applied the deadline
    val v1 = StreamingFrame.StateEnvelope.Enveloped(1,
      """{"k":3,"reached":2,"last":123456789}""")
    assert(StreamingFrame.StateEnvelope.decodeFunnel(v1, 3) ==
      ((2, 123456789L, 123456789L)))
    intercept[IllegalStateException] {
      StreamingFrame.StateEnvelope.decodeFunnel(v1, 3, 604800L)
    }
  }

  test("windowed twin under anchor disorder: a late EARLIER step-1 " +
      "event re-bases future deadlines (tightening); already-made " +
      "advances stand (the documented over-count)") {
    implicit val sqlCtx = spark.sqlContext
    // tightening case: anchor a@1000 arrives, then the TRUE anchor a@10
    // arrives late, then b@1050 — the tightened deadline (10+100=110)
    // censors b, matching batch
    val mem1 = MemoryStream[(Long, Timestamp, String)]
    val out1 = StreamingFrame.streamingFunnel(
      mem1.toDF.toDF("u", "t", "y"), "u", "t", "y", Seq("a", "b"),
      windowSeconds = 100L)
    val q1 = out1.writeStream.format("memory").queryName("funnel_tight")
      .outputMode("update").start()
    Seq(Seq((1L, ts(1000), "a")), Seq((1L, ts(10), "a")),
      Seq((1L, ts(1050), "b"))).foreach { b =>
      mem1.addData(b); q1.processAllAvailable()
    }
    q1.stop()
    assert(spark.sql(
      "SELECT max(reached) FROM funnel_tight WHERE actor = '1'")
      .head().getInt(0) == 1)
    // over-count case: the advance lands BEFORE the true anchor shows
    // up — frontier state cannot retro-censor (documented two-sided
    // caveat: batch reads 1 here, streaming 2)
    val mem2 = MemoryStream[(Long, Timestamp, String)]
    val out2 = StreamingFrame.streamingFunnel(
      mem2.toDF.toDF("u", "t", "y"), "u", "t", "y", Seq("a", "b"),
      windowSeconds = 100L)
    val q2 = out2.writeStream.format("memory").queryName("funnel_over")
      .outputMode("update").start()
    Seq(Seq((1L, ts(1000), "a")), Seq((1L, ts(1050), "b")),
      Seq((1L, ts(10), "a"))).foreach { b =>
      mem2.addData(b); q2.processAllAvailable()
    }
    q2.stop()
    assert(spark.sql(
      "SELECT max(reached) FROM funnel_over WHERE actor = '1'")
      .head().getInt(0) == 2)
    val batch = EventAnalytics.funnel(
      Seq((1L, ts(1000), "a"), (1L, ts(1050), "b"), (1L, ts(10), "a"))
        .toDF("u", "t", "y"), "u", "t", "y", Seq("a", "b"),
      windowSeconds = 100L).collect()
    assert(batch(1).getLong(2) == 0L) // batch censors b entirely
  }

  test("windowed streamingFunnel replayed in event-time order equals " +
      "the windowed batch funnel") {
    val rnd = new scala.util.Random(31)
    val events = Seq.fill(400)((rnd.nextInt(40).toLong,
      ts(rnd.nextInt(500)), s"${('a' + rnd.nextInt(4)).toChar}"))
    val ordered = events.sortBy(e => (e._2.getTime, e._3))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFrame.streamingFunnel(
      mem.toDF.toDF("u", "t", "y"), "u", "t", "y", steps,
      windowSeconds = 120L)
    val q = out.writeStream.format("memory").queryName("funnel_win")
      .outputMode("update").start()
    ordered.grouped(90).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.sql(
      "SELECT actor, reached FROM funnel_win").collect()
      .groupBy(_.getString(0))
      .map { case (_, rows) => rows.map(_.getInt(1)).max }
    val streamCounts = (1 to steps.size).map(i =>
      streamed.count(_ >= i).toLong)
    val batchCounts = EventAnalytics.funnel(
      events.toDF("u", "t", "y"), "u", "t", "y", steps,
      windowSeconds = 120L).collect().map(_.getLong(2)).toSeq
    assert(streamCounts == batchCounts)
    // and the window genuinely censors in this fixture
    val unwindowed = EventAnalytics.funnel(
      events.toDF("u", "t", "y"), "u", "t", "y", steps)
      .collect().map(_.getLong(2)).toSeq
    assert(batchCounts != unwindowed)
  }
}
