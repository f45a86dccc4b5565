package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classifier, Corpus, SpanDedup}

/** Specs for the round-4 curation operators: exact-substring span dedup,
  * the fixed-point Naive Bayes classifier, URL canonicalization, and the
  * per-source datacard.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repeatedSpans finds the shared passage and merges overlapping grams") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one unique opening here $shared and a unique tail one"),
      (2L, s"two different opening text $shared plus another tail two"),
      (3L, "totally unrelated words nothing repeats in this document at all"))
      .toDF("id", "text")
    val out = SpanDedup.repeatedSpans(docs, "id", "text", k = 3)
      .orderBy("id").collect()
    // docs 1 and 2 share an 8-token passage: 6 overlapping 3-grams merge
    // into ONE span covering exactly the 8 shared tokens
    assert(out(0).getAs[Long]("dup_spans") === 1L)
    assert(out(0).getAs[Long]("dup_tokens") === 8L)
    assert(out(1).getAs[Long]("dup_spans") === 1L)
    assert(out(1).getAs[Long]("dup_tokens") === 8L)
    assert(out(2).getAs[Long]("dup_spans") === 0L)
    assert(out(2).getAs[Long]("dup_tokens") === 0L)
  }

  test("repeatedSpans catches a repeat within a single document") {
    val docs = Seq(
      (1L, "x y z filler filler2 filler3 x y z end"),
      (2L, "completely distinct content with no repeated trigram here ok"))
      .toDF("id", "text")
    val out = SpanDedup.repeatedSpans(docs, "id", "text", k = 3)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("dup_spans") === 2L)
    assert(out(0).getAs[Long]("dup_tokens") === 6L)
    assert(out(1).getAs[Long]("dup_tokens") === 0L)
  }

  test("removeRepeatedSpans cuts every duplicated occurrence") {
    // mixed case: gram identity is case-insensitive, surviving text keeps
    // its ORIGINAL casing
    val docs = Seq(
      (1L, "A b C d E tail One"),
      (2L, "a B c D e two tail"))
      .toDF("id", "text")
    val out = SpanDedup.removeRepeatedSpans(docs, "id", "text", k = 5)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("clean_text") === "tail One")
    assert(out(1).getAs[String]("clean_text") === "two tail")
    assert(out(0).getAs[Long]("kept_tokens") === 2L)
  }

  test("naive bayes recovers an obvious two-class separation") {
    val train = Seq(
      ("spam", "buy cheap pills now buy buy"),
      ("spam", "cheap cheap offer buy now"),
      ("ham", "meeting notes for the quarterly review"),
      ("ham", "please review the attached meeting agenda"))
      .toDF("label", "text")
    val test = Seq(
      (1L, "cheap pills offer"),
      (2L, "quarterly meeting review"))
      .toDF("id", "text")
    val (w, c) = Classifier.trainNaiveBayes(train, "label", "text")
    val out = Classifier.scoreNaiveBayes(test, "id", "text", w, c)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("pred") === "spam")
    assert(out(1).getAs[String]("pred") === "ham")
  }

  test("naive bayes: empty document falls back to the best prior") {
    val train = Seq(
      ("a", "x x x"), ("a", "x y"), ("b", "z w"))
      .toDF("label", "text")
    val test = Seq((1L, "")).toDF("id", "text")
    val (w, c) = Classifier.trainNaiveBayes(train, "label", "text")
    val out = Classifier.scoreNaiveBayes(test, "id", "text", w, c).collect()
    assert(out.length === 1)
    // class a has 2 of 3 training docs: larger prior wins with no tokens
    assert(out(0).getAs[String]("pred") === "a")
  }

  test("tfIdfTopTerms ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "shared shared unique1"),
      (2L, "shared unique2 unique2"),
      (3L, "shared other words"))
      .toDF("id", "text")
    val out = Corpus.tfIdfTopTerms(docs, "id", "text", k = 2)
      .orderBy("id", "rank").collect()
    // doc 1: "shared" tf=2 at idf 1.0 (2.0M) beats "unique1" tf=1 at idf
    // ln(2)+1 (1.69M); doc 2: "unique2" tf=2 at the distinctive idf wins
    assert(out(0).getAs[String]("term") === "shared")
    assert(out(1).getAs[String]("term") === "unique1")
    assert(out(2).getAs[String]("term") === "unique2")
    assert(out(2).getAs[Long]("tf") === 2L)
    // integer-exact score: tf × round(idf·1e6)
    val n = 3.0
    val idfU = math.round((math.log((n + 1) / (1 + 1)) + 1) * 1e6)
    assert(out(2).getAs[Long]("score") === 2L * idfU)
  }

  test("predictExpr matches the distributed scorer row for row") {
    val train = Seq(
      ("spam", "buy cheap pills now buy buy"),
      ("spam", "cheap cheap offer buy now"),
      ("ham", "meeting notes for the quarterly review"),
      ("ham", "please review the attached meeting agenda"))
      .toDF("label", "text")
    val test = Seq(
      (1L, "cheap pills offer"), (2L, "quarterly meeting review"),
      (3L, "unrelated tokens entirely"), (4L, ""))
      .toDF("id", "text")
    val (w, c) = Classifier.trainNaiveBayes(train, "label", "text")
    val dist = Classifier.scoreNaiveBayes(test, "id", "text", w, c)
      .orderBy("id").collect().map(r => r.getAs[String]("pred"))
    val model = Classifier.collectModel(w, c)
    val perRow = test
      .withColumn("pred", Classifier.predictExpr(model)(col("text")))
      .orderBy("id").collect().map(r => r.getAs[String]("pred"))
    assert(dist.toSeq === perRow.toSeq)
  }

  test("crossSetMatches finds planted near-duplicates across sets") {
    // identical leaked vector on both sides (same bucket by construction);
    // the other pairs are orthogonal or opposite and can never pass
    val leaked = Seq.fill(8)(0.1)
    val bench = Seq((1L, leaked), (2L, Seq.fill(8)(-0.5)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((100L, leaked), (101L, Seq.fill(8)(0.5).zipWithIndex
      .map { case (v, i) => if (i % 2 == 0) v else -v }))
      .toDF("vec_id", "embedding")
    val out = ops.Similarity.crossSetMatches(
      corpus, "vec_id", bench, "vec_id", "embedding",
      dim = 8, numPlanes = 2, threshold = 0.9).collect()
    // the near-identical pair (100, 1) shares a bucket and passes the
    // threshold; the orthogonal/opposite vectors never do
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 1L)))
  }

  test("curriculumBins assigns equal-width rank bins deterministically") {
    val rows = (0 until 20).map(i => (i.toLong, (19 - i).toDouble))
    val df = rows.toDF("id", "score")
    val out = ops.Sampling.curriculumBins(df, "id", "score", bins = 4)
      .orderBy("rank").collect()
    // lowest score = rank 0; 20 rows into 4 bins of 5
    assert(out(0).getAs[Long]("id") === 19L)
    assert(out(0).getAs[Long]("bin") === 0L)
    assert(out(19).getAs[Long]("id") === 0L)
    assert(out(19).getAs[Long]("bin") === 3L)
    assert(out.map(_.getAs[Long]("rank")).toSeq === (0L until 20L))
    assert(out.groupBy(_.getAs[Long]("bin")).view.mapValues(_.length).toMap ===
      Map(0L -> 5, 1L -> 5, 2L -> 5, 3L -> 5))
  }

  test("curriculumBins breaks score ties by id") {
    val df = Seq((5L, 1.0), (3L, 1.0), (9L, 0.5)).toDF("id", "score")
    val out = ops.Sampling.curriculumBins(df, "id", "score", bins = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(9L, 3L, 5L))
  }

  test("exactSample returns exactly n rows, stable across partitionings") {
    val df = (0L until 100L).toDF("id")
    val a = ops.Sampling.exactSample(df, "id", n = 10, salt = "s")
      .collect().map(_.getLong(0)).toSet
    val b = ops.Sampling.exactSample(df.repartition(7), "id", 10, "s")
      .collect().map(_.getLong(0)).toSet
    assert(a.size === 10)
    assert(a === b)
    // different salt re-deals the sample
    val c = ops.Sampling.exactSample(df, "id", 10, "other")
      .collect().map(_.getLong(0)).toSet
    assert(a !== c)
  }

  test("tokenBudgetPerGroup respects the budget and never starves a group") {
    val df = Seq(
      ("a", 1L, "one two three"), ("a", 2L, "four five"),
      ("a", 3L, "six seven eight nine"),
      ("b", 4L, "a text far larger than the whole budget in tokens here"))
      .toDF("source", "doc_id", "text")
    val out = ops.Sampling.tokenBudgetPerGroup(df, "source", "doc_id",
      ops.TextAnalysis.tokenCount(col("text")), budget = 6L).collect()
    val byGroup = out.groupBy(_.getAs[String]("source"))
    // group a: kept rows stay within 6 cumulative tokens
    assert(byGroup("a").map(_.getAs[Long]("cum_tokens")).max <= 6L)
    // group b's single 11-token doc survives via the first-row guard
    assert(byGroup("b").map(_.getAs[Long]("doc_id")).toSeq === Seq(4L))
  }

  test("incrementalDedup: first-wins within batch, seen fingerprints drop") {
    val seen = Seq("already ingested doc").toDF("text")
      .select(ops.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batch = Seq(
      (10L, "fresh content one"),
      (11L, "fresh content one"), // within-batch dup: id 10 wins
      (12L, "already ingested doc"), // cross-increment dup: dropped
      (13L, "fresh content two"))
      .toDF("doc_id", "text")
    val out = ops.Dedup.incrementalDedup(batch, "doc_id", "text", seen)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(10L, 13L))
  }

  test("Pipeline.curate gates, scrubs, dedups and annotates in one pass") {
    val passing = Queries.q91Passage
    val docs = Seq(
      (1L, "web", passing),
      (2L, "web", passing), // exact dup after scrub: dropped
      (3L, "web", passing + " reach me at a@b.co"), // PII variant: kept, redacted
      (4L, "web", "way too short"))
      .toDF("doc_id", "source", "text")
    val out = ops.Pipeline.curate(docs, "doc_id", "text", "source")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(1L, 3L))
    assert(out(1).getAs[String]("clean_text").endsWith("reach me at [EMAIL]"))
    val report = ops.Pipeline.curateReport(docs, "doc_id", "text", "source")
      .collect()
    assert(report.length === 1)
    assert(report.head.getAs[Long]("docs_in") === 4L)
    assert(report.head.getAs[Long]("gate_pass") === 3L)
    assert(report.head.getAs[Long]("kept") === 2L)
  }

  test("curateReport: a NULL source is a real group — its gate_pass/kept " +
      "come back non-zero (null-safe joins, the groupedQuantiles class)") {
    val passing = Queries.q91Passage
    val docs = Seq(
      (1L, Option("web"), passing),
      (2L, Option.empty[String], passing + " extra words here"),
      (3L, Option.empty[String], "way too short"))
      .toDF("doc_id", "source", "text")
    val rows = ops.Pipeline.curateReport(docs, "doc_id", "text", "source")
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0)) ->
          (r.getAs[Long]("docs_in"), r.getAs[Long]("gate_pass"),
            r.getAs[Long]("kept"))).toMap
    assert(rows("web") === ((1L, 1L, 1L)))
    // plain-EqualTo joins read (2, 0, 0) here: the null group never
    // matched its own gate_pass/kept rows
    assert(rows(null) === ((2L, 1L, 1L)))
  }

  test("Bpe.train learns the classic merges; segment/pieceCount agree") {
    // Sennrich-style toy corpus: low x3, lower x2, newest x2
    val docs = Seq("low low low lower lower newest newest").toDF("text")
    val merges = ops.Bpe.train(docs, "text", numMerges = 3, maxWords = 100)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(ops.Bpe.segmentWord("lowest", rankOf).toSeq ===
      Seq("low", "e", "s", "t"))
    val counted = docs
      .select(ops.Bpe.pieceCount(merges)(col("text")).as("n"))
      .head().getLong(0)
    // low=1 x3, lower=low+er=2 x2, newest=n+e+w+e+s+t=6 x2
    assert(counted === 3 * 1 + 2 * 2 + 2 * 6)
  }

  test("Bpe.train stops when no pair repeats") {
    val docs = Seq("abc def ghi").toDF("text")
    val merges = ops.Bpe.train(docs, "text", numMerges = 10, maxWords = 100)
    assert(merges.isEmpty)
  }

  test("rollingAggregate: trailing window includes boundary, resets per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.00),
      (2L, 7L, ts("2024-01-01 10:30:00"), 2.00),
      (3L, 7L, ts("2024-01-01 11:00:00"), 4.00), // 10:00 still in [t-1h, t]
      (4L, 7L, ts("2024-01-01 13:00:00"), 8.00), // window reset
      (5L, 9L, ts("2024-01-01 10:45:00"), 16.00)) // other key untouched
      .toDF("event_id", "user_id", "ts", "value")
    val out = ops.TimeSeries.rollingAggregate(df, "user_id", "ts", "value",
      windowSeconds = 3600L).orderBy("event_id").collect()
    assert(out.map(_.getAs[Long]("n_window")).toSeq === Seq(1, 2, 3, 1, 1))
    assert(out(2).getAs[Long]("sum_cents_window") === 700L)
    assert(out(4).getAs[Long]("sum_cents_window") === 1600L)
  }

  test("resample buckets by hour per group") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("click", ts("2024-01-01 10:05:00"), 1.5),
      ("click", ts("2024-01-01 10:55:00"), 2.5),
      ("click", ts("2024-01-01 11:05:00"), 3.0),
      ("view", ts("2024-01-01 10:20:00"), 7.0))
      .toDF("event_type", "ts", "value")
    val out = ops.TimeSeries.resample(df, "ts", "hour", "event_type", "value")
      .orderBy("group", "bucket").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(0).getAs[Long]("sum_cents") === 400L)
    assert(out(0).getAs[Double]("max_value") === 2.5)
  }

  test("crossMinhashMatches finds the edited near-dup, skips distinct docs") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val bench = Seq((1L, base), (2L, "completely different benchmark words"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, base + " tail edit"), // lightly edited copy of bench 1
      (101L, "unrelated corpus document about nothing shared here"))
      .toDF("doc_id", "text")
    val out = ops.Dedup.crossMinhashMatches(corpus, bench, "doc_id", "text",
      threshold = 0.5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 100L)).map(_.swap))
    assert(out.head.getAs[Double]("jaccard") > 0.8)
  }

  test("hasBlockedDomain matches through explicit ports and userinfo") {
    val df = Seq(
      "see http://assets.net:8080/x today",
      "see http://user@cdn.assets.net/y today",
      "see http://fine.example.com/z today")
      .toDF("text")
    val out = df.select(col("text"),
        ops.Corpus.hasBlockedDomain(col("text"), Seq("assets.net"))
          .as("blocked"))
      .collect().map(r => r.getString(0).contains("example") -> r.getBoolean(1))
    assert(out.filter(!_._1).forall(_._2), "port/userinfo hosts must match")
    assert(out.filter(_._1).forall(!_._2))
  }

  test("quantileBin: qcut boundaries, duplicate collapse, null preservation") {
    // 1..8 with quartile fit: interior boundaries at ranks p*(n-1) for
    // p = .25/.5/.75 over n=8 → 2.75, 4.5, 6.25 (linear interpolation)
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val fit = ops.FeaturePrep.fitQuantileBins(df, "v", bins = 4)
    assert(fit.boundaries.toSeq == Seq(2.75, 4.5, 6.25))
    val codes = df.select(ops.FeaturePrep.quantileBin(fit)(col("v")).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(codes == Seq(0, 0, 1, 1, 2, 2, 3, 3))
    // heavy repeated value: duplicate boundaries drop (qcut duplicates="drop")
    val heavy = (Seq.fill(9)(5.0) ++ Seq(1.0, 9.0)).toDF("v")
    val hFit = ops.FeaturePrep.fitQuantileBins(heavy, "v", bins = 4)
    assert(hFit.boundaries.length < 3, s"got ${hFit.boundaries.toSeq}")
    // nulls stay null
    val withNull = Seq[Option[Double]](Some(1.0), None, Some(8.0)).toDF("v")
    val nb = withNull.select(ops.FeaturePrep.quantileBin(fit)(col("v")).as("b"))
      .collect()
    assert(nb(1).isNullAt(0) && !nb(0).isNullAt(0))
  }

  test("targetEncode: smoothing shrinks toward the prior; unseen gets the prior") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0), (null, 50.0))
      .toDF("c", "t")
    val out = ops.FeaturePrep.targetEncode(df, "c", "t", smoothing = 2.0)
      .select("c", "c_tenc").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val prior = 45.0 // (10+20+100+50)/4
    assert(out("a") == BigDecimal((30.0 + 2 * prior) / 4)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) // 30.0
    assert(out("b") == BigDecimal((100.0 + 2 * prior) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) // 63.3333
    assert(out(null) == 45.0) // null category -> prior
    // smoothing -> infinity collapses every encoding to the prior
    val flat = ops.FeaturePrep.targetEncode(df, "c", "t", smoothing = 1e9)
      .select("c_tenc").collect().map(_.getDouble(0)).distinct
    assert(flat.forall(v => math.abs(v - prior) < 0.001))
  }

  test("standardize maps a constant column to 0.0, not NaN") {
    val df = Seq(2.0, 2.0, 2.0).toDF("v")
    val fit = ops.FeaturePrep.fitScale(df, "v")
    assert(fit.stdCents === 0.0)
    val out = df.select(ops.FeaturePrep.standardize(fit)(col("v")).as("z"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("fitScale survives sums of squares past 2^63 (decimal accumulation)") {
    // cents of 3e7 square to 9e18 ≈ Long.MaxValue; two of them wrap a
    // LongType sum silently — the decimal accumulator must stay exact
    val df = Seq(3.0e7, 3.0e7, 1.0e7).toDF("v")
    val fit = ops.FeaturePrep.fitScale(df, "v")
    assert(fit.sumSqCents == BigDecimal("19000000000000000000")) // 1.9e19 > 2^63
    // exact integer numerator: (3·Σx² − (Σx)²)/9 with Σx = 7e9 cents
    val expectedVar =
      (BigDecimal("57000000000000000000") - BigDecimal("49000000000000000000"))
        .toDouble / 9.0
    assert(fit.varCents2 == expectedVar)
    assert(fit.stdCents == math.sqrt(expectedVar))
    assert(fit.stdCents > 0.0) // the wrapped long sum would go negative → 0
  }

  test("tokenBudgetPerGroup: zero-token first row cannot smuggle a big doc") {
    // find an id pair where the empty doc hashes BEFORE the big doc so the
    // big doc is rank 2 and must obey the budget
    def h(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:".getBytes("UTF-8"))
      md.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val (emptyId, bigId) = (1L to 50L).flatMap(a =>
      (51L to 100L).map(b => (a, b))).find { case (a, b) => h(a) < h(b) }.get
    val df = Seq(
      ("g", emptyId, ""),
      ("g", bigId, "eleven words here definitely more than the budget allows to pass"))
      .toDF("source", "doc_id", "text")
    val out = ops.Sampling.tokenBudgetPerGroup(df, "source", "doc_id",
      ops.TextAnalysis.tokenCount(col("text")), budget = 5L).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(emptyId))
  }

  test("ww_vector_dot: mismatched lengths yield null, not a truncated dot") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),
        (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val out = df.selectExpr("ww_vector_dot(a, b) AS d").collect()
    assert(out(0).isNullAt(0), "ragged pair must be null")
    assert(out(1).getDouble(0) === 11.0)
  }

  test("typing-info sidecar round-trips the table name") {
    import graft.frame.WoodworkFrame
    val f = WoodworkFrame.init(Seq((1L, "a")).toDF("id", "v"),
      name = Some("my_table"))
    val json = graft.io.ReadWrite.typingInfoJson(f)
    val back = graft.io.ReadWrite.typingInfoFromJson(json)
    assert(back.name === Some("my_table"))
  }

  test("skewReport surfaces heavy hitters with exact shares") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = ops.SkewJoin.skewReport(df, "k", k = 2).collect()
    assert(out.map(_.getAs[String]("value")).toSeq === Seq("hot", "warm"))
    assert(out(0).getAs[Long]("cnt") === 6L)
    assert(out(0).getAs[Double]("share") === 0.6)
  }

  test("robustScale: (x−median)/IQR; zero-IQR column maps to 0.0, not NaN") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val fit = ops.FeaturePrep.fitRobust(df, "v")
    assert(fit.median === 3.0 && fit.q1 === 2.0 && fit.q3 === 4.0)
    val out = df.select(ops.FeaturePrep.robustScale(fit)(col("v")).as("r"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(-1.0, -0.5, 0.0, 0.5, 48.5))

    val flat = Seq[Option[Double]](Some(5.0), Some(5.0), Some(5.0), None)
      .toDF("v")
    val ffit = ops.FeaturePrep.fitRobust(flat, "v")
    assert(ffit.iqr === 0.0)
    val fout = flat.select(ops.FeaturePrep.robustScale(ffit)(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(fout.toSeq === Seq(0.0, 0.0, 0.0, null)) // null stays null
  }

  test("winsorize clamps tails at exact quantiles and preserves nulls") {
    val df = (1 to 100).map(_.toDouble) ++ Seq(10000.0)
    val wdf = (df.map(Option(_)) :+ None).toDF("v")
    val fit = ops.FeaturePrep.fitWinsor(wdf, "v", 0.05, 0.95)
    assert(fit.lo === 6.0 && fit.hi === 96.0) // ranks 0.05·100 and 0.95·100
    val out = wdf.select(ops.FeaturePrep.winsorize(fit)(col("v")).as("w"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.count(_ == null) == 1)
    val nums = out.filter(_ != null).map(_.asInstanceOf[Double])
    assert(nums.min == 6.0 && nums.max == 96.0)
    assert(nums.count(_ == 6.0) == 6)   // 1..5 clamp up + the real 6
    assert(nums.count(_ == 96.0) == 6)  // 97..100 and 10000 clamp down + 96
    assert(nums.sorted.toSeq.slice(10, 90) ==
      (11 to 90).map(_.toDouble)) // interior untouched
  }

  test("quantile fits rank over post-cast values; all-non-numeric raises") {
    // 16 numeric strings + 4 non-numeric: ranks must come from the 16
    // castable values, or the 0.95 rank walks off the table into NaN
    val vals = (1 to 16).map(i => (i * 10).toString) ++
      Seq("abc", "def", "ghi", "jkl")
    val df = vals.toDF("v")
    val fit = ops.FeaturePrep.fitWinsor(df, "v", 0.0, 1.0)
    assert(fit.lo === 10.0 && fit.hi === 160.0) // NOT NaN
    val rfit = ops.FeaturePrep.fitRobust(df, "v")
    assert(rfit.q1 === 47.5 && rfit.median === 85.0 && rfit.q3 === 122.5)
    val err = intercept[IllegalArgumentException] {
      ops.FeaturePrep.fitRobust(Seq("x", "y").toDF("v"), "v")
    }
    assert(err.getMessage.contains("no non-null numeric values"))
  }

  test("FeaturePrep: exact-cents fit, z-score/minmax transforms, encoding") {
    val df = Seq(1.00, 2.00, 3.00, 4.00).toDF("v")
    val fit = ops.FeaturePrep.fitScale(df, "v")
    assert(fit.n === 4L)
    assert(fit.sumCents === 1000L)
    assert(fit.minCents === 100L && fit.maxCents === 400L)
    val out = df.select(col("v"),
        ops.FeaturePrep.standardize(fit)(col("v")).as("z"),
        ops.FeaturePrep.minMax(fit)(col("v")).as("mm"))
      .orderBy("v").collect()
    // mean 2.5, population std sqrt(1.25) over cents: z(1.0) ≈ -1.3416
    assert(math.abs(out(0).getAs[Double]("z") + 1.3416) < 1e-9)
    assert(out(0).getAs[Double]("mm") === 0.0)
    assert(out(3).getAs[Double]("mm") === 1.0)
    val cats = Seq("b", "a", "b", "c", "b", "a").toDF("cat")
    val enc = ops.FeaturePrep.frequencyEncode(cats, "cat")
      .select("cat", "cat_enc").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // b (3) → 0, a (2) → 1, c (1) → 2
    assert(enc === Map("b" -> 0L, "a" -> 1L, "c" -> 2L))
  }

  test("frequencyEncode: range-partitioned rank path matches the window path") {
    // 200 distinct categories with a count gradient + ties; bound = 10
    // forces the high-cardinality path, which must be rank-identical to
    // the single-window default (same (count desc, value asc) total order)
    val cats = (0 until 200).flatMap(i =>
      Seq.fill(i % 7 + 1)(f"c$i%03d")).toDF("cat")
    val byWindow = ops.FeaturePrep.frequencyEncode(cats, "cat")
      .select("cat", "cat_enc").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byRange = ops.FeaturePrep.frequencyEncode(cats, "cat", bound = 10L)
      .select("cat", "cat_enc").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRange === byWindow)
    assert(byRange.values.toSeq.sorted === (0L until 200L))
    // most frequent category (count 7, smallest value among count-7 ties)
    assert(byRange(f"c${6}%03d") === 0L)
  }

  test("schema drift reports added/removed/retyped/retagged columns") {
    import graft.frame.WoodworkFrame
    import graft.types.{LogicalType => LT}
    val a = WoodworkFrame.init(
      Seq((1L, "x", 1.5)).toDF("id", "cat", "gone"),
      logicalTypes = Map("cat" -> LT.Categorical)).schema
    val b = WoodworkFrame.init(
      Seq((1L, "x", "new")).toDF("id", "cat", "fresh"),
      logicalTypes = Map("cat" -> LT.NaturalLanguage)).schema
    val d = a.drift(b)
    assert(d.map(r => (r._1, r._2)).toSet === Set(
      ("gone", "removed"), ("fresh", "added"),
      ("cat", "retyped"), ("cat", "retagged")))
    val retyped = d.find(_._2 == "retyped").get
    assert(retyped._3 === Some("Categorical"))
    assert(retyped._4 === Some("NaturalLanguage"))
    assert(a.drift(a).isEmpty)
  }

  test("AudioMeta decodes WAV headers and rejects malformed payloads") {
    // 1 channel, 8000 Hz, 16-bit PCM, 4000 samples → 500 ms
    def le16(v: Int) = Array((v & 255).toByte, ((v >> 8) & 255).toByte)
    def le32(v: Int) = Array(
      (v & 255).toByte, ((v >> 8) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
    val ds = 4000 * 2
    val wav = "RIFF".getBytes ++ le32(36 + ds) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(ds)
    val info = ops.AudioMeta.decode(wav).get
    assert(info.channels === 1)
    assert(info.sampleRate === 8000)
    assert(info.bitsPerSample === 16)
    assert(info.durationMs === 500L)
    assert(ops.AudioMeta.decode("not a wav at all padding padding"
      .getBytes).isEmpty)
    assert(ops.AudioMeta.decode(null).isEmpty)
    assert(ops.AudioMeta.decode(wav.take(20)).isEmpty)
  }

  test("piiPatterns scan variants ground-truth against known strings") {
    // the derived (anchor-stripped) scan patterns have no independent
    // oracle — q48/q51 embed the same strings in DuckDB — so pin them
    // here against canonical hits and non-hits
    val pats = ops.TextAnalysis.piiPatterns.toMap
    def hits(name: String, s: String): Int =
      java.util.regex.Pattern.compile(pats(name)).matcher(s)
        .results().count().toInt
    assert(hits("emails", "mail a.b+c@ex-ample.co.uk now") === 1)
    assert(hits("emails", "not an email: a@ b@") === 0)
    assert(hits("urls", "go to https://x.io/a?b=1 or http://y.net") === 2)
    assert(hits("ips", "from 10.0.0.7 and 256.1.1.1") === 1)
    assert(hits("ips", "version 1.2.3.4.5 reads as one bounded quad") <= 1)
    assert(hits("phones", "call 302-555-0101 today") === 1)
  }

  test("qualityScore: empty and whitespace-only docs score 0.0") {
    // regression: 0/0 NaN used to win least() and grant the 0.4 credit
    val out = Seq("", "   ", "real prose with the usual words here")
      .toDF("text")
      .select(ops.TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(out(0) === 0.0)
    assert(out(1) === 0.0)
    assert(out(2) > 0.0)
  }

  test("canonicalizeUrl: utm boundary anchoring and consecutive params") {
    val cases = Seq(
      // params merely CONTAINING utm_ survive
      ("http://h/p?xutm_source=1&b=2", "http://h/p?xutm_source=1&b=2"),
      // consecutive utm params all strip
      ("http://h/p?utm_a=1&utm_b=2&c=3", "http://h/p?c=3"),
      ("http://h/p?utm_a=1&utm_b=2", "http://h/p"),
      ("http://h/p?a=1&xutm_b=2", "http://h/p?a=1&xutm_b=2"))
      .toDF("url", "expected")
    val bad = cases
      .withColumn("canonical", ops.Corpus.canonicalizeUrl(col("url")))
      .where(col("canonical") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("winnowingFingerprint: short docs are case/whitespace-insensitive") {
    val df = Seq((1L, "Foo  Bar"), (2L, "foo bar")).toDF("id", "text")
    val fps = df
      .select(ops.TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
      .collect().map(_.getSeq[Long](0))
    assert(fps(0) === fps(1))
  }

  test("canonicalizeUrl applies the documented rules") {
    val cases = Seq(
      ("HTTPS://Example.COM:443/Path/?utm_source=a&id=3#frag",
        "https://example.com/Path/?id=3"),
      ("http://Host.org:80/a/b/", "http://host.org/a/b"),
      ("https://x.net/?utm_a=1&utm_b=2", "https://x.net"),
      ("https://x.net/p?id=1&utm_c=9", "https://x.net/p?id=1"),
      ("no scheme here/", "no scheme here"))
      .toDF("url", "expected")
    val out = cases
      .withColumn("canonical", Corpus.canonicalizeUrl(col("url")))
      .where(col("canonical") =!= col("expected"))
      .collect()
    assert(out.isEmpty, out.mkString(";"))
  }

  test("datacard aggregates per source with exact fixed-point quality") {
    val docs = Seq(
      ("web", "the quick brown fox jumps over the lazy dog"),
      ("web", "the quick brown fox jumps over the lazy dog"),
      ("books", "a different and much longer text about the world of books"))
      .toDF("source", "text")
    val out = Corpus.datacard(docs, "source", "text")
      .orderBy("source").collect()
    assert(out(0).getAs[String]("source") === "books")
    assert(out(0).getAs[Long]("n_docs") === 1L)
    assert(out(0).getAs[Long]("exact_dup_docs") === 0L)
    assert(out(1).getAs[String]("source") === "web")
    assert(out(1).getAs[Long]("n_docs") === 2L)
    // identical texts share a fingerprint: one of the two is an exact dup
    assert(out(1).getAs[Long]("exact_dup_docs") === 1L)
    assert(out(1).getAs[Long]("total_tokens") === 18L)
  }
}
