package graft

import graft.ops.{Corpus, Pipeline}
import graft.streaming.StreamingFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-twin equivalence for the ingest gate: the live MemoryStream
  * chain ([[StreamingFrame.ingestGate]]) must emit row-for-row what the
  * batch replay ([[Pipeline.ingestReplay]]) computes over the same corpus.
  * q125 hands the batch side to the driver's DuckDB hash check; this spec
  * closes the loop by pinning streaming == batch on a fixture where the
  * one excluded stage (watermarked near-dup) is provably the identity.
  */
class IngestTwinSpec extends SparkSpec {
  import spark.implicits._

  private val passage = Queries.q91Passage

  /** Mirrors q125's fixture shape: every 10th fails Gopher, every 9th ≡ 1
    * is the full benchmark passage (Gopher-passing, so only the Bloom
    * stage drops it), the rest are unique-token passers with an embedded
    * email.
    */
  private def docText(i: Int): String =
    if (i % 10 == 0) "short doc"
    else if (i % 9 == 1) passage
    else {
      val uniq = (0 until 55).map(j => s"tok${i}x$j").mkString(" ")
      s"$uniq contact user$i@example.com and they should review " +
        "the rest of that plan with care"
    }

  test("ingestGate over MemoryStream equals the batch ingestReplay") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((0L, passage)).toDF("bench_id", "bench_text")
    val bits = Corpus.buildGramBloom(bench, "bench_id", "bench_text",
      n = 13, numBits = 1 << 20, numHashes = 5)

    val ids = 0 until 60
    val batchDf = ids.map(i => (i.toLong, docText(i))).toDF("id", "text")
    val batch = Pipeline.ingestReplay(batchDf, "text", bits, n = 13)
      .select("id", "text", "pii_emails", "pii_urls", "pii_ips", "pii_phones")
    val batchRows = batch.collect().map(_.toSeq).toSet
    assert(batchRows.nonEmpty)

    // the excluded near-dup stage must be the identity here: every
    // surviving doc carries a distinct simhash signature (unique tokens)
    val sigs = batch.select(
        call_function("ww_simhash",
          graft.ops.TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(_.getLong(0))
    assert(sigs.distinct.length == sigs.length,
      "fixture must be signature-distinct for exact equivalence")

    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "id", "text")
    val gated = StreamingFrame.ingestGate(stream, "text", "ts", bits, n = 13)
    val q = gated.writeStream.format("memory").queryName("ingest_twin")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // two micro-batches so the equivalence covers the incremental planner,
    // not just a single-batch degenerate run
    val (front, back) = ids.splitAt(30)
    mem.addData(front.map(i => (t0, i.toLong, docText(i))))
    q.processAllAvailable()
    mem.addData(back.map(i => (t0, i.toLong, docText(i))))
    q.processAllAvailable()
    val streamed = spark.sql(
        "select id, text, pii_emails, pii_urls, pii_ips, pii_phones " +
        "from ingest_twin")
      .collect().map(_.toSeq).toSet
    q.stop()

    assert(streamed == batchRows)
  }

  test("constraintsGate over MemoryStream equals the batch quarantine filter") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Constraints._
    val cons = Seq(NotNull("v"), InRange("v", 0.0, 100.0),
      Satisfies("id_pos", col("id") > 0))
    val rows = Seq((1L, 5.0), (2L, 150.0), (-3L, 5.0), (4L, 7.0),
      (5L, -1.0), (6L, 99.9), (0L, 3.0))

    val batch = quarantine(rows.toDF("id", "v"), cons)
      .where(size(col("dq_failed")) === 0)
      .select("id", "v").collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, Double)]
    val gated = StreamingFrame.constraintsGate(mem.toDF().toDF("id", "v"), cons)
    val q = gated.writeStream.format("memory").queryName("dq_twin")
      .outputMode("append").start()
    val (a, b) = rows.splitAt(3)
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    val streamed = spark.sql("select id, v from dq_twin")
      .collect().map(_.toSeq).toSet
    q.stop()

    assert(streamed == batch)
    assert(batch.map(_.head) == Set(1L, 4L, 6L))
  }

  test("streamingDrift over MemoryStream equals the batch PSI") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Drift
    val ref = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val refDf = ref.toDF("cat")
    val shares = Drift.fitShares(refDf, "cat")
    assert(shares == Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))

    // current slice: shifted shares + ONE novel category (the regime where
    // the bounded streaming formula equals the batch full-outer PSI)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    val cur = Seq.fill(20)("a") ++ Seq.fill(45)("b") ++ Seq.fill(25)("c") ++
      Seq.fill(10)("z")
    val batchPsi = Drift.psiCategorical(refDf, cur.toDF("cat"), "cat")
      .head.getDouble(1)

    val mem = MemoryStream[String]
    val gated = StreamingFrame.streamingDrift(
      mem.toDF().toDF("cat").withColumn("ts", lit(t0)),
      "ts", "cat", shares, windowDuration = "1 minute")
    val q = gated.writeStream.format("memory").queryName("drift_twin")
      .outputMode("complete").start()
    val (a, b) = cur.splitAt(40)
    mem.addData(a); q.processAllAvailable()
    mem.addData(b); q.processAllAvailable()
    val rows = spark.sql("select n, psi from drift_twin").collect()
    q.stop()

    assert(rows.length == 1)
    assert(rows.head.getLong(0) == cur.size)
    assert(rows.head.getDouble(1) == batchPsi)
    assert(batchPsi > 0.1) // the planted shift actually reads as drift
  }
}
