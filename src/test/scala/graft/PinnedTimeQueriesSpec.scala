package graft

import org.apache.spark.sql.functions._

/** Pinned-oracle specs for the three time-series queries whose driver-side
  * correctness rows went missing in rounds 5-6 (q57/q61/q94): they read the
  * REAL sf0.001 parquet (so a testdata schema drift — e.g. the TIMESTAMP →
  * TIMESTAMP_NTZ regeneration that silently broke `unix_micros` — fails here,
  * not only in the driver's harness) and compare against literals produced by
  * the DuckDB oracle SQL on the same files.
  *
  * Regeneration (after any intended behavior change): run
  *   python3 tools/oraclegen.py --time-pins
  * and paste the emitted literals below (see tools/oraclegen.py footer note).
  */
class PinnedTimeQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/events.parquet").exists()

  test("q57_sessionize matches the DuckDB oracle checksums at sf0.001") {
    assume(available, s"$sf not present")
    val out = Queries.q57Sessionize(spark, sf)
    val r = out.agg(
      count(lit(1)), sum("session_index"), sum("n_events"),
      sum("duration_us"),
      sum(col("start_us") % 1000003L), sum(col("end_us") % 1000003L)).head()
    assert(r.getLong(0) == 111L)
    assert(r.getLong(1) == 375L)
    assert(r.getLong(2) == 1000L)
    assert(r.getLong(3) == 25304180435747L)
    assert(r.getLong(4) == 53198439L)
    assert(r.getLong(5) == 56721883L)
  }

  test("q61_timedelta matches the DuckDB oracle rows at sf0.001") {
    assume(available, s"$sf not present")
    val out = Queries.q61Timedelta(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      (0L, 59L, 2564638204469L, 200547420626L),
      (1L, 50L, 2480801885680L, 189460504376L),
      (2L, 67L, 2490786437035L, 161517034905L),
      (3L, 64L, 2498731891641L, 139925584216L),
      (4L, 70L, 2491506852209L, 166767801482L),
      (5L, 61L, 2425404469647L, 216940422516L),
      (6L, 61L, 2498997350183L, 192297594348L),
      (7L, 74L, 2526849345843L, 222424719570L),
      (8L, 68L, 2502514161221L, 162693994778L),
      (9L, 66L, 2527643786957L, 221544800690L),
      (10L, 70L, 2530771337428L, 199449000028L),
      (11L, 65L, 2540695758929L, 275557293142L),
      (12L, 72L, 2568943494297L, 208569697576L),
      (13L, 51L, 2569828557523L, 234845107244L),
      (14L, 87L, 2527077508476L, 129645669624L))
    assert(out.toSeq == expected)
  }

  test("q94_rolling_window matches the DuckDB oracle checksums at sf0.001") {
    assume(available, s"$sf not present")
    val out = Queries.q94RollingWindow(spark, sf)
    val r = out.agg(
      count(lit(1)), sum("n_window"), sum("sum_cents_window"),
      sum(col("event_id") * col("n_window"))).head()
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == 1098L)
    assert(r.getLong(2) == 5513975L)
    assert(r.getLong(3) == 548429L)
  }
}
