package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, Map[String, Any]] = {
    val df = TextAnalysis.gopherRepetition(rows.toSeq.toDF("id", "t"), "id", "t")
    val cols = df.columns
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("duplicate lines: occurrence and character fractions") {
    // 4 non-empty lines; "same line" appears twice (9 chars each)
    val t = "same line\nunique one\nsame line\nother two"
    val out = run(1L -> t)(1L)
    assert(out("dup_line_frac") == 0.5)  // 2 dup occurrences / 4 lines
    assert(out("dup_line_char_frac") ==
      math.round(18.0 / t.length * 10000) / 10000.0)
  }

  test("top n-gram fraction: most frequent bigram, longer gram breaks ties") {
    //  "aa bb" x3 dominates; chars = 5 per occurrence
    val t = "aa bb cc aa bb dd aa bb"
    val out = run(1L -> t)(1L)
    assert(out("top_2gram_char_frac") ==
      math.round(15.0 / t.length * 10000) / 10000.0)
  }

  test("duplicate n-gram fraction counts all occurrences, capped at 1") {
    // one 5-word phrase repeated: every 5-gram inside is duplicated, so
    // covered chars exceed text length -> capped
    val t = ("tok1 tok2 tok3 tok4 tok5 tok6 " * 4).trim
    val out = run(1L -> t)(1L)
    assert(out("dup_5gram_char_frac") == 1.0)
    assert(out("pass") == false)
  }

  test("clean text passes; empty and single-token docs score zero") {
    val clean = (1 to 80).map(i => s"w$i").mkString(" ")
    val out = run(1L -> clean, 2L -> "", 3L -> "word")
    assert(out(1L)("pass") == true)
    for (id <- Seq(2L, 3L); m <- TextAnalysis.RepetitionThresholds.keys)
      assert(out(id)(m) == 0.0, s"id=$id $m")
    assert(out(2L)("pass") == true)
  }

  test("repetitionMetrics (per-row) equals gopherRepetition (batch) field by field") {
    val docs = Seq(
      1L -> "same line\nunique one\nsame line\nother two",
      2L -> "aa bb cc aa bb dd aa bb",
      3L -> ("tok1 tok2 tok3 tok4 tok5 tok6 " * 4).trim,
      4L -> (1 to 80).map(i => s"w$i").mkString(" "),
      5L -> "",
      6L -> "word",
      7L -> "Alpha beta\nALPHA BETA gamma delta epsilon zeta")
    val df = docs.toDF("id", "t")
    val batch = TextAnalysis.gopherRepetition(df, "id", "t")
    val cols = batch.columns
    val perRow = df
      .select(col("id"), TextAnalysis.repetitionMetrics(col("t")).as("m"))
      .select(col("id") +: cols.tail.map(c => col(s"m.$c").as(c)): _*)
    val b = batch.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val p = perRow.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    for (id <- docs.map(_._1))
      assert(b(id) == p(id), s"id=$id batch=${b(id)} perRow=${p(id)}")
  }

  test("streaming repetition gate drops repetitive docs statelessly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val gated = graft.streaming.StreamingFrame.repetitionGate(
      mem.toDF.toDF("id", "t"), "t")
    val q = gated.writeStream.format("memory")
      .queryName("rep_gate_out").outputMode("append").start()
    try {
      mem.addData(
        1L -> (1 to 80).map(i => s"w$i").mkString(" "),
        2L -> ("tok1 tok2 tok3 tok4 tok5 tok6 " * 4).trim)
      q.processAllAvailable()
      val ids = spark.table("rep_gate_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L))
    } finally q.stop()
  }

  test("case-insensitive token units; lines keep case") {
    val t = "Alpha beta\nALPHA BETA gamma delta epsilon zeta"
    val out = run(1L -> t)(1L)
    // "alpha beta" bigram occurs twice after lowering
    assert(out("top_2gram_char_frac") ==
      math.round(20.0 / t.length * 10000) / 10000.0)
    // the two lines differ in case -> no duplicate lines
    assert(out("dup_line_frac") == 0.0)
  }
}
