package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level operators for training-data pipelines: benchmark
  * decontamination, context-window chunking, corpus n-gram statistics and
  * URL/domain profiling.
  *
  * Shared shape decisions (the 100 TB reasoning):
  *   - word n-grams come from posexplode + window `lead` partitioned by doc —
  *     the tokenizer runs ONCE per row and gram assembly stays in codegen
  *     (no higher-order-function re-inlining of the tokenizer per gram);
  *   - nothing materializes an all-pairs or corpus-wide distinct; joins are
  *     candidate-restricted and the small side is broadcast.
  */
object Corpus {

  /** Exploded word n-gram table: (id, pos, gram). Duplicate grams kept —
    * callers that need set semantics aggregate with count_distinct instead
    * of paying a corpus-wide distinct shuffle.
    */
  private[graft] def gramTable(df: DataFrame, idCol: String, textCol: String,
                               n: Int): DataFrame = {
    val toksOf = TextAnalysis.tokens(col(textCol))
    val base = df.where(size(toksOf) >= n)
      .select(col(idCol).as("id"), posexplode(toksOf).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    base
      .withColumn("gram",
        concat_ws(" ", (0 until n).map(j => lead(col("tok"), j).over(w)): _*))
      .withColumn("last", lead(col("tok"), n - 1).over(w))
      .where(col("last").isNotNull)
      .select(col("id"), col("pos"), col("gram"))
  }

  /** Benchmark decontamination: which corpus documents share at least
    * `minOverlap` DISTINCT word n-grams with which benchmark documents
    * (the standard "did my eval set leak into training data" check; n = 13
    * is the common choice at real scale).
    *
    * Plan shape: the benchmark gram set (small — eval sets are thousands of
    * docs) is broadcast, so the corpus side streams map-side through the
    * join with no corpus shuffle; only MATCHED gram hits reach the
    * (corpus_id, bench_id) aggregation. Grams join on md5 so the key is a
    * fixed 32 bytes regardless of n.
    *
    * Output: (corpus_id, bench_id, overlap) sorted by ids.
    */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int = 13, minOverlap: Int = 1): DataFrame = {
    // corpus side: the native per-row ww_ngrams expression removes the
    // exploded-token window exchange entirely — the corpus streams through
    // the broadcast join with ZERO pre-join shuffle; fallback keeps the
    // window gram table when the extension is not registered
    val native = corpus.sparkSession.sessionState.catalog.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("ww_ngrams"))
    val cg =
      if (native)
        corpus.select(col(idCol).as("corpus_id"),
          explode(call_function("ww_ngrams",
            TextAnalysis.tokens(col(textCol)), lit(n))).as("g"))
      else gramTable(corpus, idCol, textCol, n)
        .select(col("id").as("corpus_id"), md5(col("gram")).as("g"))
    val bg = gramTable(bench, benchIdCol, benchTextCol, n)
      .select(col("id").as("bench_id"), md5(col("gram")).as("g"))
      .distinct()
    cg.join(broadcast(bg), "g")
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count_distinct(col("g")).as("overlap"))
      .where(col("overlap") >= minOverlap)
  }

  /** Context-window chunking: split each document into token chunks of
    * `chunkSize` advancing by `stride` (stride < chunkSize ⇒ overlapping
    * chunks). A start position is emitted only while the PREVIOUS chunk did
    * not already reach the end of the document, so tail chunks are shorter
    * but never fully contained in their predecessor (the Hugging Face
    * `return_overflowing_tokens` convention). Empty documents emit nothing.
    *
    * Pure projection + explode: no shuffle at any scale.
    *
    * Output: (id, chunk_index, n_tokens, chunk_text).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toksOf = TextAnalysis.tokens(col(textCol))
    val starts = filter(
      sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride)),
      s => s === 0 || s - stride + chunkSize < size(col("toks")))
    df.where(size(toksOf) > 0)
      .select(col(idCol).as("id"), toksOf.as("toks"))
      .select(col("id"), col("toks"), posexplode(starts).as(Seq("chunk_index", "start")))
      .select(
        col("id"), col("chunk_index"),
        least(lit(chunkSize), size(col("toks")) - col("start"))
          .cast(LongType).as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Corpus-wide top-k word n-grams by occurrence count (ties broken by
    * gram ascending). groupBy + orderBy + limit compiles to partial
    * TakeOrderedAndProject — only k rows per partition ever move.
    */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame =
    gramTable(df, idCol, textCol, n)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("gram").asc)
      .limit(k)

  /** The benchmark side of [[contamination]] as a standalone gram-hash set,
    * collected driver-side — build once from the (small) eval corpus, reuse
    * against any number of corpus scans or an ingest stream (see
    * `StreamingFrame.decontaminate`). Bounded by the EVAL set's size, not
    * the corpus: a 100k-doc benchmark is a few million 32-byte hashes.
    */
  def benchmarkGramSet(bench: DataFrame, idCol: String, textCol: String,
                       n: Int = 13): Set[String] =
    gramTable(bench, idCol, textCol, n)
      .select(md5(col("gram")).as("g"))
      .distinct()
      .collect().map(_.getString(0)).toSet

  /** Per-row contaminated-gram count against a pre-built benchmark gram
    * set. A single scalar pipeline — the native `ww_ngrams` expression
    * tokenizes once per row, and membership is an InSet hash probe — so it
    * runs on streams (no window, no join) and adds zero shuffle to batch
    * plans. Falls back to HOF gram assembly when the extension is not
    * registered (same values; re-runs the tokenizer per gram, so register
    * `graft.GraftExtensions` on hot paths).
    */
  /** Distinct md5 word-n-gram hashes of a text column — the ONE shared
    * gram-hash expression behind exact contamination, Bloom probes and
    * (via [[graft.ops.Dedup]]'s whole-short-doc convention) LSH verify.
    * Native tokenize-once `ww_ngrams` when registered; bit-identical HOF
    * fallback otherwise. Docs shorter than n grams yield an empty array.
    */
  private[graft] def gramHashes(spark: org.apache.spark.sql.SparkSession,
                                textCol: String,
                                n: Int): org.apache.spark.sql.Column =
    if (spark.sessionState.catalog.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ww_ngrams")))
      call_function("ww_ngrams", TextAnalysis.tokens(col(textCol)), lit(n))
    else {
      val toks = TextAnalysis.tokens(col(textCol))
      array_distinct(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          md5(concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
        .otherwise(array().cast(ArrayType(StringType))))
    }

  def contaminationHits(spark: org.apache.spark.sql.SparkSession,
                        textCol: String, n: Int,
                        gramSet: Set[String]): org.apache.spark.sql.Column = {
    if (gramSet.isEmpty) lit(0)
    else coalesce(size(filter(gramHashes(spark, textCol, n),
      g => g.isInCollection(gramSet))), lit(0))
  }

  /** Bigram language-model scoring — the engine-portable proxy for the
    * KenLM perplexity filter (CCNet, Wenzek et al. 2020): train add-k
    * smoothed bigram counts on the corpus itself, then score each document
    * by its mean log2 bigram probability
    * `P(w2|w1) = (c(w1,w2) + k) / (c(w1,*) + k*V)` with V the distinct
    * unigram vocabulary. Higher scores read as "more typical of the
    * corpus"; the quality gate drops the low tail.
    *
    * Plan shape: "train" and "score" share one pass over the gram table —
    * the per-gram and per-context counts are partition-window counts
    * (shuffle keys: gram hash, then context hash), so the corpus is
    * tokenized ONCE and nothing round-trips through a driver-side model.
    * At 100 TB the count windows shuffle the gram table twice and the
    * final per-document aggregation once; the model never needs to fit
    * anywhere — it exists only as window state. V (vocabulary size) is the
    * one eager scalar, a distinct-count over exploded tokens.
    *
    * Output: (id, n_bigrams, lm_score) for documents with ≥ 1 bigram.
    */
  def bigramLmScores(df: DataFrame, idCol: String, textCol: String,
                     addK: Double = 1.0): DataFrame = {
    val vocab = df.select(
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")))
      .head().getLong(0)
    val grams = gramTable(df, idCol, textCol, 2)
      .select(col("id"), col("gram"),
        substring_index(col("gram"), " ", 1).as("ctx"))
    val wGram = Window.partitionBy(col("gram"))
    val wCtx = Window.partitionBy(col("ctx"))
    val p = (col("c_bigram") + lit(addK)) /
      (col("c_ctx") + lit(addK) * lit(vocab.toDouble))
    grams
      .withColumn("c_bigram", count(lit(1)).over(wGram))
      .withColumn("c_ctx", count(lit(1)).over(wCtx))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log2(p)), 4).as("lm_score"))
  }

  /** CCNet-style perplexity partition (Wenzek et al. 2020): split the
    * corpus into equal head/middle/tail buckets by language-model score —
    * the composition of [[bigramLmScores]] (train+score in one plan) and
    * [[Sampling.curriculumBins]] (global rank without a global window).
    * Higher lm_score = lower perplexity, so rank ascends from the most
    * perplexed: labels default to (tail, middle, head). Documents with
    * fewer than 2 tokens have no bigram score and are absent, matching
    * [[bigramLmScores]].
    *
    * Output: (id, lm_score, rank, bucket).
    */
  def perplexityPartition(df: DataFrame, idCol: String, textCol: String,
                          addK: Double = 1.0,
                          labels: Seq[String] = Seq("tail", "middle", "head"))
      : DataFrame = {
    require(labels.nonEmpty, "need at least one bucket label")
    val scores = bigramLmScores(df, idCol, textCol, addK)
    val binned = graft.ops.Sampling.curriculumBins(
      scores, "id", "lm_score", labels.size)
    binned.select(col("id"), col("score").as("lm_score"), col("rank"),
      element_at(typedlit(labels), (col("bin") + 1).cast(IntegerType))
        .as("bucket"))
  }

  /** Per-group top-k curation: keep the `k` best rows per group under
    * `scoreCol` — the "best documents per source/domain" pass that follows
    * quality scoring in a pretraining pipeline. Ties break on ascending id
    * so the selection is deterministic across engines and retries.
    *
    * Plan shape: one shuffle on the group key, then a partition-local sort
    * feeding a streaming `row_number` — rank-k selection never materializes
    * a group in memory beyond the sort spill machinery, and nothing
    * resembling a per-group self-join or max-subquery appears. At 100 TB
    * the group key (source/domain) has moderate cardinality and heavy skew;
    * the window sort is external (spills), so a hot domain slows its own
    * task but cannot OOM it.
    *
    * Output: (group, id, score, rank) with rank in [1, k].
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   score: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id").asc)
    df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        score.as("score"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Deterministic k-hash Bloom filter over a benchmark's distinct n-gram
    * hashes — the constant-memory alternative to [[benchmarkGramSet]] when
    * the contamination side is itself large (deduplicating a new crawl
    * against last year's multi-billion-gram corpus: an exact set no longer
    * broadcasts, a 1M-bit Bloom always does). Bit positions come from
    * seeded xxhash64 (Kirsch–Mitzenmacher-style independent seeds), so the
    * filter is reproducible across engines and sessions.
    *
    * `numBits` must be a power of two. Returns the packed bitset
    * (little-endian within each word: bit i of word w = position w*64+i).
    */
  def buildGramBloom(bench: DataFrame, idCol: String, textCol: String,
                     n: Int, numBits: Int = 1 << 20,
                     numHashes: Int = 5): Array[Long] = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64 (whole 64-bit words), got $numBits")
    val g = gramTable(bench, idCol, textCol, n)
      .select(md5(col("gram")).as("g")).distinct()
    val positions = g.select(explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(lit(i), col("g")), lit(numBits))): _*)).as("p"))
      .distinct()
      .collect().map(_.getLong(0))
    val bits = new Array[Long](numBits / 64)
    positions.foreach(p => bits((p >> 6).toInt) |= (1L << (p & 63)))
    bits
  }

  /** Per-row count of word n-grams that HIT the Bloom filter (possible
    * contamination; false-positive rate set by the filter sizing, zero
    * false negatives). A pure scalar pipeline like [[contaminationHits]]:
    * the bitset rides the plan as ONE array literal (no per-element codegen,
    * no join, no shuffle), each gram tests `numHashes` indexed bit probes —
    * so the corpus side streams, on batch or on a stream.
    */
  def bloomHits(spark: org.apache.spark.sql.SparkSession, textCol: String,
                n: Int, bits: Array[Long],
                numHashes: Int = 5): org.apache.spark.sql.Column = {
    val numBits = bits.length * 64
    val bitsLit = typedlit(bits.toSeq)
    val grams = gramHashes(spark, textCol, n)
    def bitSet(g: org.apache.spark.sql.Column, i: Int) = {
      val p = pmod(xxhash64(lit(i), g), lit(numBits.toLong))
      val word = element_at(bitsLit, shiftright(p, 6).cast(IntegerType) + 1)
      call_function("shiftright", word, (p % 64).cast(IntegerType))
        .bitwiseAND(lit(1L)) === lit(1L)
    }
    coalesce(size(filter(grams, g =>
      (0 until numHashes).map(i => bitSet(g, i)).reduce(_ && _))), lit(0))
  }

  /** Regex for pulling URLs out of running text (the config validation
    * pattern, which is anchored-free already) and the host capture.
    */
  private def urlScanRegex: String = graft.config.WwConfig.options.urlInferenceRegex
  val HostCapture = "^https?://([^/]+)"

  /** Lowercased host with userinfo ("user@") and ":port" stripped — the
    * form the blocklist suffix match and the domain profile key on. Without
    * this, "http://assets.net:8080/x" would dodge a blocked "assets.net".
    */
  private def normalizedHost(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(
      lower(regexp_extract(u, HostCapture, 1)), "^[^@]*@", ""), ":\\d+$", "")

  /** True when the document's text links to a blocked domain — exact host
    * match or any subdomain (`cdn.assets.net` matches a blocked
    * `assets.net`). Blocklists are bounded (they're curated), so the list
    * rides the plan as one array literal and the whole test is a per-row
    * scalar: extract URLs, lower-case hosts, expand each host's parent
    * suffixes, and overlap against the literal — no explode, no join, no
    * shuffle, which also makes it a valid streaming-ingest gate.
    */
  def hasBlockedDomain(textCol: org.apache.spark.sql.Column,
                       blocked: Seq[String]): org.apache.spark.sql.Column = {
    require(blocked.nonEmpty, "empty domain blocklist")
    val blockedLit = typedlit(blocked.map(_.toLowerCase))
    val hosts = transform(
      regexp_extract_all(textCol, lit(urlScanRegex), lit(0)),
      u => normalizedHost(u))
    exists(hosts, h => {
      val parts = split(h, "\\.")
      val suffixes = transform(sequence(lit(1), size(parts)),
        i => array_join(slice(parts, i, size(parts)), "."))
      arrays_overlap(suffixes, blockedLit)
    })
  }

  /** Corpus rows that do NOT link to any blocked domain — the URL/domain
    * blocklist pass of a crawl-curation pipeline.
    */
  def domainBlocklistFilter(df: DataFrame, textCol: String,
                            blocked: Seq[String]): DataFrame =
    df.where(!hasBlockedDomain(col(textCol), blocked))

  /** Per-domain URL profile over a corpus: for each lowercased host,
    * total URL occurrences and distinct documents containing it. The
    * canonical source-mix / domain-blocklist signal. Explode is linear in
    * URL count; the single shuffle key is the host.
    *
    * Output: (domain, n_urls, n_docs).
    */
  def domainCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit(urlScanRegex), lit(0)))
          .as("url"))
      .select(col("id"), normalizedHost(col("url")).as("domain"))
      .where(col("domain") =!= "")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), count_distinct(col("id")).as("n_docs"))

  /** URL canonicalization: the normalization pass of a crawl-dedup
    * pipeline. Rules (each a pure regex projection, documented contract):
    * drop the `#fragment`; lowercase scheme and host; strip the scheme's
    * default port (`:80` http, `:443` https); remove `utm_*` tracking
    * query params and any dangling `?`/`&`; strip one trailing `/`.
    * Malformed inputs without a `scheme://host` prefix pass through with
    * only the fragment/utm/trailing-slash rules applied to the whole
    * string. No shuffle — composes into scans and streaming gates.
    */
  def canonicalizeUrl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val schemeHost = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val noFrag = regexp_replace(c, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_replace(noFrag, schemeHost, "")
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    def cleanRest(r: org.apache.spark.sql.Column) = {
      // boundary-anchored utm stripping: an unanchored pattern would also
      // mangle params whose names merely CONTAIN "utm_" (e.g. xutm_source)
      val r1 = regexp_replace(r, "&utm_[A-Za-z0-9_]*=[^&#]*", "")
      val r2 = regexp_replace(r1, "\\?utm_[A-Za-z0-9_]*=[^&#]*&", "?")
      val r3 = regexp_replace(r2, "\\?utm_[A-Za-z0-9_]*=[^&#]*$", "")
      val r4 = regexp_replace(r3, "[?&]$", "")
      regexp_replace(r4, "/$", "")
    }
    when(scheme =!= "", concat(scheme, lit("://"), hostNoPort, cleanRest(rest)))
      .otherwise(cleanRest(noFrag))
  }

  /** Canonical-URL dedup profile: distinct raw spellings and total
    * occurrences per canonical URL — the measure of how much crawl
    * frontier the normalization collapses. One shuffle on the canonical
    * key.
    */
  def canonicalUrlCounts(df: DataFrame, urlCol: String): DataFrame =
    df.select(col(urlCol).as("url"), canonicalizeUrl(col(urlCol)).as("canonical"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("url")).as("n_variants"))

  /** TF-IDF top terms per document. IDF uses the smooth sklearn form
    * ln((N+1)/(df+1)) + 1, stored in FIXED-POINT micro-units (BIGINT), so
    * the per-term score tf × idf is an exact integer product — rankings
    * and scores hash-match across engines and partitionings (no
    * order-dependent double sums anywhere).
    *
    * Plan shape for 100 TB: term frequencies shuffle on (doc, term); the
    * document-frequency table shuffles on term and joins back on term (a
    * vocabulary-sized side — NOT forced broadcast, AQE picks the strategy);
    * top-k is a per-doc streaming row_number, never materializing a
    * document's full term list outside the window sort.
    *
    * Output: (id, term, tf, score, rank) with rank in [1, k].
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val n = df.count()
    val tf = df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is already distinct per (id, term): doc frequency is a plain count
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dft"))
    val idfU = round((log(lit((n + 1).toDouble) /
      (col("dft") + lit(1)).cast(DoubleType)) + lit(1.0)) * lit(1e6))
      .cast(LongType)
    val scored = tf.join(dfreq.select(col("term"), idfU.as("idf_u")), Seq("term"))
      .select(col("id"), col("term"), col("tf"),
        (col("tf") * col("idf_u")).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
  }

  /** Per-source corpus datacard: document counts, token volume, quality,
    * exact-duplicate and language profile — the summary table a dataset
    * release ships. One aggregation pass over the corpus (token/quality/
    * fingerprint are per-row projections; the only shuffle is the source
    * groupBy). Quality is averaged in fixed-point (per-doc score × 10⁴ as
    * BIGINT) so the mean is order-independent and hash-exact.
    *
    * Output per source: (source, n_docs, total_tokens, avg_tokens,
    * avg_quality, exact_dup_docs, n_langs).
    */
  def datacard(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val q4 = round(TextAnalysis.qualityScore(t) * 10000).cast(LongType)
    df.select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(t).as("toks"), q4.as("q4"),
        TextAnalysis.fingerprint(t).as("fp"),
        TextAnalysis.langId(t).as("lang"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        round(sum(col("toks")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 2).as("avg_tokens"),
        round(sum(col("q4")).cast(DoubleType) /
          (count(lit(1)) * lit(10000)).cast(DoubleType), 4).as("avg_quality"),
        (count(lit(1)) - count_distinct(col("fp"))).as("exact_dup_docs"),
        count_distinct(col("lang")).as("n_langs"))
  }
}
