package graft

import java.sql.Timestamp

import graft.ops.TimeSeries
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-twin equivalence for forward fill: replaying a log through
  * micro-batches IN EVENT-TIME ORDER must emit exactly the batch
  * forwardFill values — and disordered arrivals must UNDER-fill (emit
  * the row as-is) rather than fabricate a fill from the newer carry.
  */
class StreamingFfillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streamingForwardFill replayed in event-time order equals the " +
      "batch forwardFill") {
    val rnd = new scala.util.Random(57)
    // unique timestamps (the twin has no tiebreak arm), ~2/3 null
    // values, and a REAL null-key group (the batch op fills it as its
    // own partition — the twin must too)
    val times = rnd.shuffle((1 to 300).toList)
    val events = times.map { t =>
      val k: java.lang.Long = rnd.nextInt(10) match {
        case 0 => null
        case n => java.lang.Long.valueOf(n.toLong)
      }
      (k, ts(t.toLong),
        if (rnd.nextInt(3) == 0) java.lang.Double.valueOf(rnd.nextInt(50))
        else null.asInstanceOf[java.lang.Double])
    }
    assert(events.exists(_._1 == null))
    val ordered = events.sortBy(_._2.getTime)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Option[Long], Timestamp, Option[Double])]
    val out = StreamingFrame.streamingForwardFill(
      mem.toDF.toDF("k", "t", "v"), "k", "t", "v")
    val q = out.writeStream.format("memory").queryName("ffill_twin")
      .outputMode("update").start()
    ordered.map(e => (Option(e._1).map(_.longValue), e._2,
        Option(e._3).map(_.doubleValue)))
      .grouped(80).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = spark.sql(
        "SELECT key, t_micros, value FROM ffill_twin").collect()
      .map(r => (Option(r.getString(0)).map(_.toLong), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val batch = TimeSeries.forwardFill(events.toDF("k", "t", "v"),
        "k", "t", Seq("v")).collect()
      .map(r => ((if (r.isNullAt(0)) None else Some(r.getLong(0))),
        r.getTimestamp(1).getTime * 1000L) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(streamed.size == events.size)
    assert(streamed == batch)
  }

  test("late rows under-fill (never the newer carry) and cannot move " +
      "the frontier; envelope carries exact double bits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Option[Double])]
    val out = StreamingFrame.streamingForwardFill(
      mem.toDF.toDF("k", "t", "v"), "k", "t", "v")
    val q = out.writeStream.format("memory").queryName("ffill_late")
      .outputMode("update").start()
    // in-order: v=1.5 @10, null @30 (fills 1.5)
    mem.addData(Seq((1L, ts(10), Some(1.5)), (1L, ts(30), None)))
    q.processAllAvailable()
    // late null @20: batch fills 1.5; the twin cannot know -> None.
    // late non-null 9.0 @15: emits itself, must NOT become the carry
    mem.addData(Seq((1L, ts(20), None), (1L, ts(15), Some(9.0))))
    q.processAllAvailable()
    // frontier row @40 with null: carry must still read 1.5, not 9.0
    mem.addData(Seq((1L, ts(40), None)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT t_micros, value FROM ffill_late").collect()
      .map(r => r.getLong(0) / 1000000L ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(10L) == Some(1.5) && got(30L) == Some(1.5))
    assert(got(20L) == None) // under-fill, not 1.5 and never 9.0
    assert(got(15L) == Some(9.0)) // late non-null emits itself
    assert(got(40L) == Some(1.5)) // frontier carry uncorrupted
    // exact bits round-trip through the envelope
    val e = StreamingFrame.StateEnvelope.encodeFfill(7L, Some(0.1 + 0.2))
    assert(StreamingFrame.StateEnvelope.decodeFfill(e) ==
      ((7L, Some(0.1 + 0.2))))
    assert(StreamingFrame.StateEnvelope.decodeFfill(
      StreamingFrame.StateEnvelope.encodeFfill(3L, None)) == ((3L, None)))
  }
}
