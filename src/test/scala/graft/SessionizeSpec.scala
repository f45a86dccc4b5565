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
}
