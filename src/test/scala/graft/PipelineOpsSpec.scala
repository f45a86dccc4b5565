package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup, Similarity, TextAnalysis}

/** Round-4 pipeline operators: per-group top-k curation, repeated-line
  * removal, bigram LM scoring, Bloom decontamination, distributed k-means,
  * and SemDeDup.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerGroup: k best per group, deterministic id tie-break") {
    val df = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("b", 5L, 0.7)).toDF("g", "id", "s")
    val out = Corpus.topKPerGroup(df, "g", "id", col("s"), k = 2)
      .orderBy("grp", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // ties on 0.9 resolve to the smaller id first
    assert(out.toSeq == Seq(("a", 2L, 1L), ("a", 3L, 2L), ("b", 5L, 1L)))
  }

  test("removeDuplicateLines: repeated lines vanish everywhere, order kept") {
    val df = Seq(
      (1L, "keep one\nboilerplate\nkeep two"),
      (2L, "boilerplate\nunique here"),
      (3L, "  boilerplate  \nlast doc"),
      (4L, "boilerplate")).toDF("id", "text")
    val cleaned = TextAnalysis.removeDuplicateLines(df, "id", "text", minDocs = 3)
      .orderBy("id").collect()
    assert(cleaned.map(_.getString(1)).toSeq ==
      Seq("keep one\nkeep two", "unique here", "last doc", ""))
    assert(cleaned.map(_.getLong(3)).toSeq == Seq(1L, 1L, 1L, 1L)) // n_removed
  }

  test("removeDuplicateLines: trimmed-form matching, empty lines survive") {
    val df = Seq(
      (1L, "a\n\nb\nspam"), (2L, " spam \nc\n\nd"), (3L, "spam\ne")).toDF("id", "text")
    val out = TextAnalysis.removeDuplicateLines(df, "id", "text", minDocs = 3)
      .orderBy("id").collect()
    // 'spam' matches via trim in doc 2; empty lines are never counted as dups
    assert(out.map(_.getString(1)).toSeq == Seq("a\n\nb", "c\n\nd", "e"))
  }

  test("removeDuplicateLines: null text yields empty output with zero counts") {
    val df = Seq((1L, "x\ny"), (2L, null.asInstanceOf[String]), (3L, "x\nz"))
      .toDF("id", "text")
    val out = TextAnalysis.removeDuplicateLines(df, "id", "text", minDocs = 2)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 0L &&
      out(1).getLong(3) == 0L)
    assert(out(0).getString(1) == "y" && out(2).getString(1) == "z")
  }

  test("hasBlockedDomain: exact host, subdomain, and no-match cases") {
    val df = Seq(
      (1L, "see https://cdn.assets.net/x for files"),
      (2L, "see https://assets.net/y direct"),
      (3L, "see https://safe-assets.net/z lookalike"),
      (4L, "see https://other.org/ok and http://deep.sub.assets.net/q"),
      (5L, "no urls at all")).toDF("id", "text")
    val out = df.select(col("id"),
        Corpus.hasBlockedDomain(col("text"), Seq("assets.net")).as("b"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    // suffix expansion matches whole domain labels only: safe-assets.net is
    // a different registered domain and must NOT match
    assert(out.toSeq == Seq((1L, true), (2L, true), (3L, false),
      (4L, true), (5L, false)))
  }

  test("domainBlocklistFilter: keeps only unblocked docs") {
    val df = Seq(
      (1L, "https://bad.example.com/a"), (2L, "https://fine.org/b"))
      .toDF("id", "text")
    val kept = Corpus.domainBlocklistFilter(df, "text", Seq("bad.example.com"))
      .select("id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
  }

  test("bigramLmScores: add-1 probabilities match hand arithmetic") {
    // corpus: doc1 = "a b a b", doc2 = "a b c"; V = 3 (a, b, c)
    // bigram counts: (a b)=3, (b a)=1, (b c)=1; ctx counts: a=3, b=2
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("id", "text")
    val out = Corpus.bigramLmScores(df, "id", "text", addK = 1.0)
      .orderBy("id").collect()
    def lg(p: Double) = math.log(p) / math.log(2.0)
    // doc1 grams: (a b), (b a), (a b) → p = 4/6, 2/5, 4/6
    val d1 = (lg(4.0 / 6) + lg(2.0 / 5) + lg(4.0 / 6)) / 3
    // doc2 grams: (a b), (b c) → p = 4/6, 2/5
    val d2 = (lg(4.0 / 6) + lg(2.0 / 5)) / 2
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    assert(math.abs(out(0).getDouble(2) - math.rint(d1 * 1e4) / 1e4) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - math.rint(d2 * 1e4) / 1e4) < 1e-9)
  }

  test("bloom filter: zero false negatives; hits match exact set on fixture") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon eta"), // shares 2 distinct 5-grams? no: 1
      (11L, "totally different words here none match"),
      (12L, "alpha beta gamma delta epsilon zeta exact")).toDF("id", "text")
    val bits = Corpus.buildGramBloom(bench, "id", "text", n = 5,
      numBits = 1 << 16, numHashes = 5)
    val hits = corpus.select(col("id"),
        Corpus.bloomHits(spark, "text", 5, bits, numHashes = 5).as("h"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val exact = Corpus.benchmarkGramSet(bench, "id", "text", n = 5)
    val exactHits = corpus.select(col("id"),
        Corpus.contaminationHits(spark, "text", 5, exact).as("h"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    // no false negatives: bloom >= exact per doc; at this sizing, equal
    assert(hits.toSeq == exactHits.toSeq)
    assert(hits(0)._2 >= 1 && hits(1)._2 == 0 && hits(2)._2 >= 2)
  }

  test("streaming bloomDecontaminate drops bloom-hit docs at ingest") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val bits = Corpus.buildGramBloom(bench, "id", "text", n = 3,
      numBits = 1 << 16, numHashes = 5)
    val mem = MemoryStream[(Long, String)]
    val clean = graft.streaming.StreamingFrame.bloomDecontaminate(
      mem.toDF().toDF("id", "text"), "text", bits, n = 3)
    val q = clean.writeStream.format("memory").queryName("bloomclean")
      .outputMode("append").start()
    mem.addData(
      (1L, "contains alpha beta gamma inside itself"),
      (2L, "totally unrelated clean document text here"))
    q.processAllAvailable()
    val kept = spark.sql("select id from bloomclean").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
    q.stop()
  }

  test("kmeansFit: converges to the two planted centers") {
    val pts = (0 until 50).map(i => (i.toLong, Array(0.0f + i % 3 * 0.01f, 0.0f))) ++
      (50 until 100).map(i => (i.toLong, Array(10.0f + i % 3 * 0.01f, 10.0f)))
    val df = pts.toDF("id", "v")
    val cs = Similarity.kmeansFit(df, "v", k = 2, iters = 5, seed = 7L)
    val sorted = cs.sortBy(_.head)
    assert(math.abs(sorted(0)(0)) < 0.1 && math.abs(sorted(0)(1)) < 0.1)
    assert(math.abs(sorted(1)(0) - 10.0) < 0.1 && math.abs(sorted(1)(1) - 10.0) < 0.1)
  }

  test("kmeansSummary: sizes partition the input, inertia nonnegative") {
    val pts = (0 until 60).map(i =>
      (i.toLong, Array((i % 6).toFloat, (i % 5).toFloat)))
    val df = pts.toDF("id", "v")
    val out = Similarity.kmeansSummary(df, "v", k = 3, iters = 4, seed = 1L)
      .collect()
    assert(out.map(_.getLong(1)).sum == 60L)
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("semanticDedup: near-identical vectors collapse to min-id canonical") {
    val base = (0 until 40).map(i =>
      (i.toLong, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 7).toFloat, 1.0f)))
    // plant exact duplicates of ids 0 and 1
    val dups = Seq((100L, base(0)._2), (101L, base(0)._2), (102L, base(1)._2))
    val df = (base ++ dups).toDF("id", "v")
    val out = Similarity.semanticDedup(df, "id", "v", k = 4, tau = 0.9999,
      iters = 3, seed = 5L)
    val dropped = out.where(!col("keep")).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(dropped.toSeq == Seq(100L, 101L, 102L))
    assert(out.count() == 43L)
  }

  test("semanticDedupScaled pins k at kMin below the scale threshold") {
    // 43 rows << kMin·targetCell, so the scaled variant must produce the
    // bit-identical verdict set as an explicit k = kMin call
    val base = (0 until 40).map(i =>
      (i.toLong, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 7).toFloat, 1.0f)))
    val dups = Seq((100L, base(0)._2), (101L, base(0)._2), (102L, base(1)._2))
    val df = (base ++ dups).toDF("id", "v")
    val scaled = Similarity.semanticDedupScaled(df, "id", "v", tau = 0.9999,
      kMin = 4, iters = 3, seed = 5L).orderBy("id").collect()
    val fixed = Similarity.semanticDedup(df, "id", "v", k = 4, tau = 0.9999,
      iters = 3, seed = 5L).orderBy("id").collect()
    assert(scaled.toSeq == fixed.toSeq)
  }
}
