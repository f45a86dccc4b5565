package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

class C4CleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(rows: (Long, String)*): Map[Long, (Long, Long, Long, Boolean, String)] =
    TextAnalysis.c4Clean(rows.toSeq.toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getString(5)))).toMap

  test("line rules: terminal punctuation, min words, javascript mention") {
    val out = clean(
      1L -> "This line is kept.\nno punct here\nShort.\nPlease enable javascript now.\nAnother good sentence!\nIs this kept?")
    val (nLines, nKept, nSent, kept, text) = out(1L)
    assert(nLines == 6)
    // "no punct here" (no terminal mark), "Short." (< 3 words) and the
    // javascript line drop; the ., ! and ? lines survive
    assert(nKept == 3 && nSent == 3 && kept)
    assert(text == "This line is kept.\nAnother good sentence!\nIs this kept?")
  }

  test("page rules: sentence minimum, lorem ipsum, curly brace") {
    val out = clean(
      1L -> "Only one kept sentence here.\nnothing else",
      2L -> "One good sentence stays.\nA second good one stays.\nAnd a third survives.",
      3L -> "First sentence is fine.\nSecond sentence is fine.\nThird is lorem ipsum filler.",
      4L -> "function f() {\nFirst sentence is fine.\nSecond sentence is fine.\nThird sentence is fine.")
    assert(!out(1L)._4)            // < 3 sentences
    assert(out(2L)._4)
    assert(!out(3L)._4)            // lorem ipsum anywhere on the raw page
    assert(!out(4L)._4)            // curly brace anywhere on the raw page
    // page verdicts never change the line-level output
    assert(out(4L)._5.startsWith("First sentence"))
  }

  test("quotes count as terminal punctuation; lines are trimmed first") {
    val out = clean(1L -> "  He said \"stop right there\"  \nplain tail")
    assert(out(1L)._2 == 1L)
    assert(out(1L)._5 == "He said \"stop right there\"")
    // a quote-terminated line carries no sentence mark: page fails the
    // sentence minimum
    assert(out(1L)._3 == 0L && !out(1L)._4)
  }

  test("streaming c4 gate: drops failing pages and emits cleaned text, equal to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      1L -> "One good sentence stays.\nA second good one stays.\nAnd a third survives.\nbad tail",
      2L -> "Only one kept sentence here.\nnothing else",
      3L -> "function f() {\nFirst sentence is fine.\nSecond is fine.\nThird is fine.")
    val batch = TextAnalysis.c4Clean(docs.toDF("id", "t"), "id", "t")
      .where(col("page_kept"))
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingFrame
      .c4Gate(mem.toDF.toDF("id", "t"), "t")
      .writeStream.format("memory").queryName("c4_gate_out")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("c4_gate_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == batch)
      assert(got.keySet == Set(1L))
      assert(got(1L) ==
        "One good sentence stays.\nA second good one stays.\nAnd a third survives.")
    } finally q.stop()
  }

  test("empty and whitespace-only text: zero kept, page dropped, no nulls") {
    val out = clean(1L -> "", 2L -> "   \n  ")
    assert(out(1L) == ((1L, 0L, 0L, false, "")))
    assert(out(2L) == ((2L, 0L, 0L, false, "")))
  }
}
