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
}
