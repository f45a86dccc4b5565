package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Sampling}

/** Corpus ops (decontamination, chunking, n-gram stats, domains) and
  * deterministic sampling/splitting.
  */
class CorpusSamplingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("hashSplit: total partition, determinism, approximate proportions, salt re-deal") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(ids, "id", splits)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 400, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 200)
    assert(math.abs(counts("test") - 1000L) < 200)
    // determinism: identical assignment on re-run
    val b = Sampling.hashSplit(ids, "id", splits)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // a different salt re-deals a nontrivial share
    val c = Sampling.hashSplit(ids, "id", splits, salt = "other")
      .withColumnRenamed("split", "split2")
    val moved = a.join(c, "id")
      .where(col("split") =!= col("split2")).count()
    assert(moved > 1000, s"only $moved rows moved under a new salt")
  }

  test("deterministicSample: stable subset at the requested rate") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val s1 = Sampling.deterministicSample(ids, "id", 0.3)
    val n = s1.count()
    assert(math.abs(n - 3000L) < 300, s"n=$n")
    assert(s1.exceptAll(Sampling.deterministicSample(ids, "id", 0.3)).isEmpty)
    // monotone: a larger fraction keeps a superset
    val s2 = Sampling.deterministicSample(ids, "id", 0.6)
    assert(s1.exceptAll(s2).isEmpty)
  }

  test("stratifiedSample: per-stratum rates, zero default") {
    import spark.implicits._
    val df = (0L until 6000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "s")
    val out = Sampling.stratifiedSample(df, "id", "s", Map("a" -> 1.0, "b" -> 0.25))
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 2000L)
    assert(math.abs(counts.getOrElse("b", 0L) - 500L) < 150)
    assert(!counts.contains("c"))
  }

  test("chunkByTokens: stride/overlap boundaries and tail suppression") {
    val df = docs(
      1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", // 10 toks
      2L -> "a b c d e",                      // 5 toks: starts 0, 3
      3L -> "solo",                           // 1 tok
      4L -> "")                               // empty: no chunks
    val out = Corpus.chunkByTokens(df, "id", "text", chunkSize = 4, stride = 3)
      .orderBy("id", "chunk_index")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1L)
    // starts 0,3,6 kept; 9 dropped (previous chunk reached the end)
    assert(doc1.map(_._4).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(doc1.map(_._3).toSeq == Seq(4L, 4L, 4L))
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.map(_._4).toSeq == Seq("a b c d", "d e"))
    assert(doc2.map(_._3).toSeq == Seq(4L, 2L))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq("solo"))
    assert(!out.exists(_._1 == 4L))
  }

  test("chunking property: concatenating stride-aligned chunk prefixes rebuilds every doc") {
    // with stride s, dropping the trailing (chunkSize - s) overlap tokens of
    // every chunk except the last reconstructs the exact token stream
    val rnd = new scala.util.Random(7)
    val data = (1L to 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(30))("t" + rnd.nextInt(99)).mkString(" ")
    }
    val df = docs(data: _*)
    val (cs, st) = (8, 5)
    val chunks = Corpus.chunkByTokens(df, "id", "text", cs, st)
      .orderBy("id", "chunk_index")
      .collect().map(r => (r.getLong(0), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    data.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) assert(!chunks.contains(id))
      else {
        val cks = chunks(id).map(_.split(" ").toSeq)
        val rebuilt = cks.init.map(_.take(st)).flatten ++ cks.last
        assert(rebuilt == toks, s"doc $id: $rebuilt != $toks")
      }
    }
  }

  test("contamination: shared n-grams found, overlap counts distinct grams") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta",   // contains bench 10's grams
      2L -> "one two three four five six seven",
      3L -> "alpha beta gamma delta other words here")
    val bench = docs(
      10L -> "alpha beta gamma delta epsilon",        // 3-grams: abc,bcd,cde
      11L -> "totally disjoint benchmark content")
    val out = Corpus.contamination(corpus, "id", "text", bench, "id", "text",
        n = 3, minOverlap = 1)
      .orderBy("corpus_id", "bench_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares all 3 distinct 3-grams of bench 10; doc 3 shares 2
    assert(out.toSeq == Seq((1L, 10L, 3L), (3L, 10L, 2L)))
  }

  test("ww_ngrams native expression matches the batch gram table's md5 set") {
    val df = docs(
      1L -> "one two three four five six",
      2L -> "short doc",          // < n tokens -> no grams
      3L -> "a b a b a b")        // duplicate grams -> distinct set
    val n = 3
    val native = df.select(col("id"),
        call_function("ww_ngrams", graft.ops.TextAnalysis.tokens(col("text")),
          lit(n)).as("g"))
      .select(col("id"), explode(col("g")).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.ops.Corpus.gramTable(df.toDF("id", "text"), "id", "text", n)
      .select(col("id"), md5(col("gram")).as("g"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == batch)
    assert(!native.exists(_._1 == 2L))
  }

  test("streaming decontaminate drops gram-sharing docs at ingest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bench = docs(100L -> "alpha beta gamma delta epsilon")
    val gramSet = graft.ops.Corpus.benchmarkGramSet(bench, "id", "text", n = 3)
    assert(gramSet.size == 3)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("id", "text")
    val clean = graft.streaming.StreamingFrame.decontaminate(
      stream, "text", gramSet, n = 3)
    val q = clean.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    mem.addData(
      (1L, "contains alpha beta gamma inside itself"),
      (2L, "totally unrelated clean document text here"))
    q.processAllAvailable()
    val kept = spark.sql("select id from decontam").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
    q.stop()
  }

  test("topNgrams: counts and deterministic tie-break") {
    val df = docs(1L -> "x y x y z", 2L -> "x y q")
    // bigrams: doc1: "x y","y x","x y","y z"; doc2: "x y","y q"
    val out = Corpus.topNgrams(df, "id", "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("x y", 3L), ("y q", 1L), ("y x", 1L)))
  }

  test("incremental profile: merge of disjoint batches equals whole-table profile") {
    import spark.implicits._
    import graft.stats.IncrementalProfile
    val df = (1L to 500L).map(i =>
      (i, if (i % 7 == 0) None else Some(i.toDouble % 13), (i % 50).toDouble))
      .toDF("id", "a", "b")
    val whole = IncrementalProfile.finalize(
      IncrementalProfile.profile(df, Seq("a", "b")))
    val merged = IncrementalProfile.finalize(IncrementalProfile.merge(Seq(
      IncrementalProfile.profile(df.where(col("id") <= 200), Seq("a", "b")),
      IncrementalProfile.profile(df.where(col("id") > 200 && col("id") <= 400), Seq("a", "b")),
      IncrementalProfile.profile(df.where(col("id") > 400), Seq("a", "b")))))
    val w = whole.orderBy("column_name").collect().map(_.toSeq)
    val m = merged.orderBy("column_name").collect().map(_.toSeq)
    assert(w.toSeq == m.toSeq) // including the HLL nunique estimate
    // sanity: the stats themselves
    val aRow = whole.where(col("column_name") === "a").head
    // count is the NON-NULL count (describe parity): 500 rows − 71 nulls
    assert(aRow.getAs[Long]("count") == 429L)
    assert(aRow.getAs[Long]("null_count") == 71L)
    assert(aRow.getAs[Long]("nunique_approx") == 13L)
  }

  test("incremental profile quantiles: merged KLL sketch answers percentiles") {
    import spark.implicits._
    import graft.stats.IncrementalProfile
    // exact regime (n=100 < k=200): merged-sketch quantiles are the order
    // statistics at ceil(p*n), regardless of how rows were batched
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "a")
    val merged = IncrementalProfile.merge(Seq(
      IncrementalProfile.profile(df.where(col("id") % 2 === 0), Seq("a"), quantiles = true),
      IncrementalProfile.profile(df.where(col("id") % 2 === 1), Seq("a"), quantiles = true)))
    val q = IncrementalProfile.quantiles(merged).head
    assert((q.getDouble(1), q.getDouble(2), q.getDouble(3)) == (25.0, 50.0, 75.0))

    // approximate regime (n=20000 >> k): DataSketches guarantees ~1.65%
    // normalized rank error at k=200; assert a loose 5% rank window
    val big = (1L to 20000L).map(i => (i, i.toDouble)).toDF("id", "a")
    val bigMerged = IncrementalProfile.merge(Seq(
      IncrementalProfile.profile(big.where(col("id") <= 10000), Seq("a"), quantiles = true),
      IncrementalProfile.profile(big.where(col("id") > 10000), Seq("a"), quantiles = true)))
    val bq = IncrementalProfile.quantiles(bigMerged).head
    for ((p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val got = bq.getDouble(i + 1)
      assert(math.abs(got / 20000.0 - p) < 0.05, s"p$p rank error: $got")
    }

    // profiles without the sketch refuse quantiles with a clear message
    val plain = IncrementalProfile.profile(df, Seq("a"))
    val err = intercept[IllegalArgumentException] {
      IncrementalProfile.quantiles(plain)
    }
    assert(err.getMessage.contains("quantiles = true"))

    // labels: full decimal precision, exact in BigDecimal space (0.07 must
    // not become p7_000000000000001), nearby ranks must not collide
    val labeled = IncrementalProfile.quantiles(merged,
      ps = Seq(0.07, 0.5, 0.995, 0.9995))
    assert(labeled.columns.toSeq ==
      Seq("column_name", "p7", "p50", "p99_5", "p99_95"))
    val dup = intercept[IllegalArgumentException] {
      IncrementalProfile.quantiles(merged, ps = Seq(0.5, 0.5))
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("domainCounts: host extraction, lowercasing, distinct docs") {
    val df = docs(
      1L -> "see https://A.Example.com/x and https://a.example.com/y",
      2L -> "ref http://b.org/z plus https://a.example.com/w",
      3L -> "no urls at all")
    val out = Corpus.domainCounts(df, "id", "text")
      .orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a.example.com", 3L, 2L), ("b.org", 1L, 1L)))
  }
  test("probabilitySample: per-row keep probability against the id hash; " +
      "null/NaN probabilities drop; clamp to [0,1]") {
    import spark.implicits._
    import graft.ops.Sampling
    val d = Seq(
      (1L, 1.0),   // always kept (hash < 1 for any hash)
      (2L, 0.0),   // never kept
      (3L, -5.0),  // clamps to 0: never kept
      (4L, 7.0),   // clamps to 1: always kept
      (5L, Double.NaN), // dropped
      (6L, 0.5)
    ).toDF("id", "p")
    val kept = Sampling.probabilitySample(d, "id", "p", salt = "s")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(4L))
    assert(!kept.contains(2L) && !kept.contains(3L) && !kept.contains(5L))
    // row 6 keeps iff its hash is below 0.5 — exactly the shared hash01
    val h = d.where(col("id") === 6)
      .select(Sampling.hash01(col("id"), "s")).head().getDouble(0)
    assert(kept.contains(6L) == (h < 0.5))
    // determinism: same salt, same verdicts; different salt re-deals
    val again = Sampling.probabilitySample(d, "id", "p", salt = "s")
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // statistical sanity at scale: keep rate tracks the probability
    val big = spark.range(20000).select(col("id"),
      (col("id") % 10).cast("double").divide(10.0).as("p"))
    val rate = Sampling.probabilitySample(big, "id", "p")
      .count().toDouble / 20000
    assert(math.abs(rate - 0.45) < 0.02, s"rate $rate")
  }
}
