package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-twin equivalence for cohort retention: replaying an event
  * log through micro-batches IN EVENT-TIME ORDER must emit cell hits
  * whose (cohort, offset) counts equal
  * [[EventAnalytics.cohortRetention]] over the same log — and the
  * documented cross-batch-disorder caveat must under-count, never
  * over-count.
  */
class StreamingCohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Long) = new Timestamp(day * 86400L * 1000L)

  test("streamingCohort replayed in event-time order equals the batch " +
      "retention cells, including cohort sizes from offset-0 hits") {
    val rnd = new scala.util.Random(19)
    val events = Seq.fill(300)((rnd.nextInt(25).toLong,
      ts(rnd.nextInt(40).toLong)))
    val ordered = events.sortBy(_._2.getTime)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = StreamingFrame.streamingCohort(
      mem.toDF.toDF("u", "t"), "u", "t", periodDays = 7)
    val q = out.writeStream.format("memory").queryName("cohort_twin")
      .outputMode("update").start()
    ordered.grouped(70).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.sql(
      """SELECT cohort_period, period_offset, count(*) n
        |FROM cohort_twin GROUP BY 1, 2""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = EventAnalytics.cohortRetention(
      events.toDF("u", "t"), "u", "t", periodDays = 7).collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val cell = (r.getLong(0), r.getLong(1))
      assert(streamed(cell) == r.getLong(2), s"cell $cell")
      // cohort size = the cohort's offset-0 emissions
      assert(streamed((r.getLong(0), 0L)) == r.getLong(3), s"size $cell")
    }
    assert(streamed.size == batch.length)
  }

  test("cross-batch disorder under-counts, never over-counts; envelope " +
      "round-trips, rejects unknown versions and period mismatches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = StreamingFrame.streamingCohort(
      mem.toDF.toDF("u", "t"), "u", "t", periodDays = 7)
    val q = out.writeStream.format("memory").queryName("cohort_late")
      .outputMode("update").start()
    // day 10 arrives before day 0: the anchor pins to day 10, and the
    // late day-0 event (offset -2 relative to the anchor) is dropped
    // instead of wrapping into a spurious cell
    mem.addData(Seq((1L, ts(10))))
    q.processAllAvailable()
    mem.addData(Seq((1L, ts(0))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT cohort_period, period_offset FROM cohort_late " +
        "WHERE actor = '1'").collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 0L)
    // batch over the same log would anchor at day 0: cohort 0, offsets
    // {0, 1} — streaming under-counted (one cell, later cohort), and
    // emitted nothing the batch form would not imply more of
    val e = StreamingFrame.StateEnvelope.encodeCohort(7, 123, 4L)
    assert(StreamingFrame.StateEnvelope.decodeCohort(e, 7) == ((123, 4L)))
    intercept[IllegalStateException] {
      StreamingFrame.StateEnvelope.decodeCohort(e.copy(version = 99), 7)
    }
    intercept[StreamingFrame.StateEnvelope.CohortConfigMismatch] {
      StreamingFrame.StateEnvelope.decodeCohort(e, 30)
    }
  }
}
