package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * statistics, quality scoring, language identification, and document
  * fingerprinting. Everything is a pure Column expression (codegen'd, no
  * UDFs) so the same arithmetic is reproducible in any ANSI engine — the
  * shared constants below are the single source of truth for both the Spark
  * expressions and the generated oracle SQL.
  */
object TextAnalysis {

  /** Compact English stopword list used for quality scoring (distinct from
    * the 1000-word NL-inference list; small enough to inline into SQL).
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "are", "was", "be", "as", "at", "by", "it", "this", "that", "from")

  /** Marker words per language for the n-gram/stopword language-ID heuristic.
    * Deliberately tiny and disjoint; CJK detection is a codepoint-class test.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "que", "y", "por"),
    "fr" -> Seq("le", "les", "et", "dans", "est", "pour"))

  val CjkRegex = "[\\x{4e00}-\\x{9fff}]"
  val PunctClass = "[.,!?;:]"

  /** Whitespace tokens, matching `regexp_extract_all(text, '\S+')`. */
  def tokens(c: Column): Column = regexp_extract_all(lower(c), lit("\\S+"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** BPE-style pre-tokenizer regex (GPT-2 family shape, RE2-compatible so
    * the identical pattern runs in any regex engine): letter runs, digit
    * runs, punctuation runs, each with optional leading space.
    */
  val BpeTokenRegex = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** Token count under the BPE-ish pre-tokenizer — the cheap proxy for "how
    * many LLM tokens is this document".
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeTokenRegex), lit(0))).cast(LongType)

  def charCount(c: Column): Column = length(c).cast(LongType)

  /** Count of punctuation characters, as the length delta under removal (the
    * same expression shape works in any SQL engine).
    */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, PunctClass, ""))).cast(LongType)

  def stopwordHits(c: Column): Column =
    size(filter(tokens(c), t => t.isin(Stopwords: _*))).cast(LongType)

  /** Composite quality score in [0,1]: stopword density (natural prose has
    * some), average word length in the prose band, and length credit.
    * Weights follow common heuristic text-quality filters (e.g. C4/Gopher
    * rules family); exact formula is this engine's own.
    */
  def qualityScore(c: Column): Column = {
    val t = tokenCount(c).cast(DoubleType)
    val chars = charCount(c).cast(DoubleType)
    val stopRatio = stopwordHits(c).cast(DoubleType) / t
    val avgWl = chars / t
    // zero-token guard: 0/0 = NaN, and least() treats NaN as GREATER than
    // everything, so an empty document would otherwise earn the full 0.4
    // stopword-density credit and outscore real low-quality prose
    when(t > 0, round(
      least(stopRatio * lit(3.0), lit(1.0)) * 0.4 +
        when(avgWl.between(3.0, 8.0), 1.0).otherwise(0.0) * 0.3 +
        least(t / lit(100.0), lit(1.0)) * 0.3, 4))
      .otherwise(lit(0.0))
  }

  /** The Gopher stop set (Rae et al. 2021, "Scaling Language Models",
    * appendix A1.1): a document must contain ≥ 2 of these to pass.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule filter (Rae et al. 2021, A1.1) with PER-RULE
    * diagnostic flags — the standard pretraining-corpus gate, kept
    * decomposed so a pipeline can report WHY documents were dropped, not
    * just drop them. Every rule is an engine-portable projection (regex +
    * arithmetic — no UDF, no shuffle); `pass` is the conjunction.
    *
    * Thresholds follow the paper: 50 ≤ words ≤ 100k, mean word length in
    * [3, 10], symbol-to-word ratio (# or …) ≤ 0.1, < 90% bullet-started
    * lines inverted as ≥ 90% non-bullet, ≤ 30% ellipsis-ended lines,
    * ≥ 80% words with an alphabetic character, ≥ 2 Gopher stopwords.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    // stage the token array as an attribute: four of the flags read it,
    // and a single projection re-evaluates a reused expression (the
    // tokenizer regex) once per reference
    val flags = gopherFlagCols(col("__t"), col("__toks"), minWords, maxWords)
    df.select(col(idCol).as("id"), col(textCol).as("__t"),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__toks"))
      .select(col("id") +: flags.map { case (n, c) => c.as(n) }: _*)
      .withColumn("pass",
        flags.collect { case (n, _) if n.startsWith("ok_") => col(n) }
          .reduce(_ && _))
  }

  /** The single pass/fail conjunction as one predicate column — the shape a
    * streaming gate or a WHERE clause wants (no join, no extra pass). The
    * token array is let-bound so the conjunction tokenizes once.
    */
  def gopherPass(t: Column, minWords: Long = 50L,
                 maxWords: Long = 100000L): Column =
    graft.util.Columns.letBind(regexp_extract_all(t, lit("\\S+"), lit(0))) {
      toks =>
        gopherFlagCols(t, toks, minWords, maxWords)
          .collect { case (n, c) if n.startsWith("ok_") => c }.reduce(_ && _)
    }

  private def gopherFlagCols(t: Column, toks: Column, minWords: Long,
                             maxWords: Long): Seq[(String, Column)] = {
    val wc = size(toks).cast(LongType)
    val nonWs = length(regexp_replace(t, "\\s", "")).cast(DoubleType)
    val meanWl = nonWs / wc.cast(DoubleType)
    val hashes = (length(t) - length(regexp_replace(t, "#", "")))
      .cast(DoubleType)
    val ellipses = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
      .cast(DoubleType)
    val symbolRatio = (hashes + ellipses) / wc.cast(DoubleType)
    val lines = split(t, "\n")
    val lc = size(lines).cast(DoubleType)
    val nonBullet = size(filter(lines, l =>
      !(ltrim(l).startsWith("•") || ltrim(l).startsWith("-") ||
        ltrim(l).startsWith("*")))).cast(DoubleType)
    val ellipsisEnd = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast(DoubleType)
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast(DoubleType)
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, w => lower(w))),
      array(GopherStopwords.map(lit): _*))).cast(LongType)
    def guarded(c: Column): Column = when(wc > 0, c).otherwise(lit(false))
    Seq(
      "word_count" -> wc,
      "ok_word_count" -> (wc >= minWords && wc <= maxWords),
      "ok_mean_word_len" -> guarded(meanWl.between(3.0, 10.0)),
      "ok_symbol_ratio" -> guarded(symbolRatio <= 0.1),
      "ok_bullet_lines" -> (nonBullet / lc >= 0.9),
      "ok_ellipsis_lines" -> (ellipsisEnd / lc <= 0.3),
      "ok_alpha_words" -> guarded(alphaWords / wc.cast(DoubleType) >= 0.8),
      "ok_stopwords" -> (stopHits >= 2L))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, Table A1): maximum
    * allowed duplicate-line fraction / duplicate-line character fraction,
    * top n-gram character fraction (n = 2, 3, 4) and duplicate n-gram
    * character fraction (n = 5..10).
    */
  val RepetitionThresholds: Map[String, Double] = Map(
    "dup_line_frac" -> 0.30, "dup_line_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15, "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13, "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11, "dup_10gram_char_frac" -> 0.10)

  /** Gopher repetition signals (Rae et al. 2021, Table A1) — the
    * repetition half of the Gopher gate, companion to [[gopherRules]]'
    * composition rules: highly self-repetitive pages (boilerplate loops,
    * scraper artifacts, keyword stuffing) are the single biggest LM-data
    * failure mode the composition rules cannot see.
    *
    * Definitions (stated exactly — reimplementations vary, so the oracle
    * mirrors these formulas):
    *   - lines = trimmed, non-empty `\n`-separated lines; an occurrence
    *     is "duplicate" when its line text appears ≥ 2 times in the doc.
    *     `dup_line_frac` = duplicate occurrences / all occurrences;
    *     `dup_line_char_frac` = their characters / `length(text)`.
    *   - word n-grams over lowercased `\S+` tokens, joined with single
    *     spaces. `top_Ngram_char_frac` (n = 2..4) = count·length of the
    *     most frequent n-gram (ties broken toward the longer gram — the
    *     covered-character value is then unique) / `length(text)`.
    *     `dup_Ngram_char_frac` (n = 5..10) = Σ count·length over n-grams
    *     occurring ≥ 2 times / `length(text)` — overlapping occurrences
    *     double-count (the standard shortcut), so fractions cap at 1.
    *   - a doc with no lines / no n-grams at some n scores 0 there (an
    *     empty doc repeats nothing).
    *
    * `pass` = every signal within [[RepetitionThresholds]].
    *
    * Scale shape: ONE explode builds every unit (lines + all n-gram
    * sizes) per row, one (id, n, unit) hash count with map-side partial
    * aggregation, one per-doc aggregation — the value_counts melt
    * pattern; nothing is driver-side and the widest shuffle is the gram
    * table (≈ tokens × 7 rows), the same order as the minhash shingle
    * fallback.
    */
  def gopherRepetition(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    // bind tokens/lines as ATTRIBUTES up front (HOF lambdas do not hoist
    // subexpressions — slicing the raw regexp_extract_all would re-run
    // the regex per position × per n), then build the unit table with
    // PLAIN explodes + rowwise slice/array_join: sequence, slice and
    // array_join are all codegen expressions, so the whole construction
    // stays inside WholeStageCodegen — measured 15× faster than the
    // equivalent interpreted transform()-lambda array build
    val base = df.select(col(idCol).as("id"),
      length(col(textCol)).as("chars"),
      tokens(col(textCol)).as("__toks"),
      filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => l =!= "").as("__lines"))
    // explode_outer keeps unit-less docs as one null-unit row (n stays
    // null so every conditional aggregate ignores it and the doc still
    // reports zeros rather than vanishing)
    val lineRows = base.select(col("id"), col("chars"),
        explode_outer(col("__lines")).as("u"))
      .select(col("id"), col("chars"),
        when(col("u").isNotNull, lit(0)).as("n"), col("u"))
    val t = col("__toks")
    val gramRows = base.select(col("id"), col("chars"), t,
        explode(array((topNs ++ dupNs).map(lit): _*)).as("n"))
      .select(col("id"), col("chars"), t, col("n"),
        explode(when(size(t) >= col("n"),
          sequence(lit(1), size(t) - col("n") + 1))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("i"))
      .select(col("id"), col("chars"), col("n"),
        array_join(slice(t, col("i"), col("n")), " ").as("u"))
    // shuffle 128-bit unit FINGERPRINTS, not unit strings: two
    // independent xxhash64 lanes + the unit length replace `u` as the
    // group key, cutting shuffle bytes several-fold on long n-grams
    // (up to 10 joined tokens each). Counts are identical unless two
    // DISTINCT units of one (id, n) collide on BOTH lanes — ≤ m²/2^129
    // per doc (m = units), < 1e-25 even for a 10M-unit document; same
    // documented-probabilistic convention as the md5 fingerprint dedup
    // ops. `len` is functionally dependent on the unit, so adding it to
    // the key changes no group.
    val counts = lineRows.unionByName(gramRows)
      .select(col("id"), col("chars"), col("n"),
        xxhash64(col("n"), col("u")).as("h1"),
        xxhash64(lit("ww_rep2"), col("u")).as("h2"),
        length(col("u")).as("len"))
      .groupBy(col("id"), col("chars"), col("n"), col("h1"), col("h2"),
        col("len"))
      .agg(count(lit(1)).as("cnt"))
    val cov = col("cnt") * col("len")
    // the (cnt, len) lexicographic max packs into ONE long (len capped at
    // 2^20−1 chars — mirrored verbatim in the oracle): a struct max would
    // force the whole roll-up into a SortAggregate (full sort of the unit
    // count table, no codegen); the packed long keeps it a HashAggregate
    val packedMax = col("cnt") * lit(1048576L) +
      least(col("len").cast(LongType), lit(1048575L))
    val aggs =
      Seq(sum(when(col("n") === 0, col("cnt")).otherwise(0L)).as("_lines"),
        sum(when(col("n") === 0 && col("cnt") >= 2, col("cnt"))
          .otherwise(0L)).as("_dupl"),
        sum(when(col("n") === 0 && col("cnt") >= 2, cov)
          .otherwise(0L)).as("_duplc")) ++
      topNs.map(n => max(when(col("n") === n, packedMax)).as(s"_top$n")) ++
      dupNs.map(n => sum(when(col("n") === n && col("cnt") >= 2, cov)
        .otherwise(0L)).as(s"_dup$n"))
    val perDoc = counts.groupBy(col("id"), col("chars"))
      .agg(aggs.head, aggs.tail: _*)
    def topCov(n: Int): Column = coalesce(
      expr(s"(_top$n div 1048576) * (_top$n % 1048576)"), lit(0L))
    val measures =
      Seq("dup_line_frac" -> repFrac(col("_dupl"), col("_lines")),
        "dup_line_char_frac" -> repFrac(col("_duplc"), col("chars"))) ++
      topNs.map(n => s"top_${n}gram_char_frac" ->
        repFrac(topCov(n), col("chars"))) ++
      dupNs.map(n => s"dup_${n}gram_char_frac" ->
        repFrac(col(s"_dup$n"), col("chars")))
    perDoc.select(col("id") +:
      measures.map { case (name, c) => c.as(name) }: _*)
      .withColumn("pass", measures.map { case (name, _) =>
        col(name) <= RepetitionThresholds(name) }.reduce(_ && _))
  }

  /** The repetition-fraction convention shared by [[gopherRepetition]]
    * and [[repetitionMetrics]]: capped at 1, zero on an empty
    * denominator, rounded to 4.
    */
  private def repFrac(num: Column, den: Column): Column =
    round(least(when(den > 0, num.cast(DoubleType) / den.cast(DoubleType))
      .otherwise(lit(0.0)), lit(1.0)), 4)

  /** Per-row single-expression twin of [[gopherRepetition]]: the same
    * eleven signals + `pass` as one STRUCT column, computed from sorted
    * unit arrays entirely inside the projection — no explode, no
    * shuffle, no state. This is the shape a streaming gate needs
    * (`StreamingFrame.repetitionGate`); equality with the batch table is
    * spec-pinned. Duplicate occurrences are elements with an equal
    * neighbor in the sorted array; the top-gram count is the longest
    * equal run, packed as the same (cnt, len-capped) BIGINT the batch
    * aggregation maximizes. Cost is O(units · log units) per row — use
    * the batch table for corpus profiling, this for per-row gating.
    */
  def repetitionMetrics(c: Column): Column = {
    import graft.util.Columns.letBind
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val chars = length(c)
    def emptyStrings = array().cast(ArrayType(StringType))
    def emptyInts = array().cast(ArrayType(IntegerType))
    // (dupOcc, dupCov, topPacked) over one unit array
    def unitStats(unitsRaw: Column): Column = letBind(array_sort(unitsRaw)) {
      s =>
        val idx = when(size(s) > 0, sequence(lit(1), size(s)))
          .otherwise(emptyInts)
        letBind(transform(idx, i => {
          val cur = element_at(s, i)
          val p = when(i > lit(1), element_at(s, i - 1))
          val nx = when(i < size(s), element_at(s, i + 1))
          (cur <=> p) || (cur <=> nx)
        })) { mask =>
          val dupOcc = size(filter(mask, f => f)).cast(LongType)
          val dupCov = aggregate(
            zip_with(mask, s, (f, g) =>
              when(f, length(g).cast(LongType)).otherwise(0L)),
            lit(0L), (acc, x) => acc + x)
          // longest equal run, tie toward the longer unit — the same
          // packed (cnt, len) encoding the batch max uses; units are
          // never "" (tokens are \S+, lines trimmed non-empty)
          val top = aggregate(s,
            struct(lit("").as("p"), lit(0L).as("r"), lit(0L).as("b")),
            (acc, g) => {
              val run = when(g === acc.getField("p"),
                acc.getField("r") + 1L).otherwise(1L)
              struct(g.as("p"), run.as("r"),
                greatest(acc.getField("b"), run * 1048576L +
                  least(length(g).cast(LongType), lit(1048575L))).as("b"))
            },
            acc => acc.getField("b"))
          struct(dupOcc.as("occ"), dupCov.as("cov"), top.as("top"),
            size(s).cast(LongType).as("m"))
        }
    }
    // integer decode (2^20 shift), exactly matching the batch topCov's
    // `div` — the former double-division decode was exact only below
    // cnt < 2^33 and risked drift between the spec-pinned twins
    def topCovOf(packed: Column): Column =
      shiftright(packed, 20) * pmod(packed, lit(1048576L))
    letBind(tokens(c)) { toks =>
      letBind(filter(transform(split(c, "\n"), l => trim(l)),
        l => l =!= "")) { lines =>
        def grams(n: Int): Column =
          when(size(toks) >= n,
            transform(sequence(lit(1), size(toks) - (n - 1)), i =>
              array_join(slice(toks, i, lit(n)), " ")))
            .otherwise(emptyStrings)
        letBind(unitStats(lines)) { ls =>
          val names =
            Seq("dup_line_frac", "dup_line_char_frac") ++
            topNs.map(n => s"top_${n}gram_char_frac") ++
            dupNs.map(n => s"dup_${n}gram_char_frac")
          val exprs =
            Seq(repFrac(ls.getField("occ"), ls.getField("m")),
              repFrac(ls.getField("cov"), chars)) ++
            topNs.map(n =>
              repFrac(topCovOf(unitStats(grams(n)).getField("top")), chars)) ++
            dupNs.map(n => repFrac(unitStats(grams(n)).getField("cov"), chars))
          // let-bind the eleven measures as ONE array: each gram unitStats
          // (the dominant per-row cost) would otherwise evaluate twice —
          // once as an output field and once inside the pass conjunction
          letBind(array(exprs: _*)) { m =>
            def at(i: Int): Column = element_at(m, i + 1)
            val pass = names.zipWithIndex.map { case (name, i) =>
              at(i) <= RepetitionThresholds(name) }.reduce(_ && _)
            struct(names.zipWithIndex.map { case (name, i) =>
              at(i).as(name) } :+ pass.as("pass"): _*)
          }
        }
      }
    }
  }

  /** C4-style line-level page cleaning (Raffel et al. 2020 §2.2, the
    * "colossal clean crawled corpus" rules): a line survives iff it has at
    * least `minLineWords` words, ends in a terminal punctuation mark, and
    * does not mention javascript; the page survives iff the cleaned text
    * still carries at least `minSentences` sentence-ending marks and the
    * raw page shows neither "lorem ipsum" nor a curly brace (the paper's
    * source-code tell). The three-sentence-span corpus dedup the paper
    * pairs with these rules is [[SpanDedup]] — compose them.
    *
    * Everything is a pure codegen'd Column projection over line arrays —
    * no UDF, no shuffle, linear at any scale — and every predicate is
    * engine-portable (the oracle states the identical regex arithmetic).
    *
    * Output per row: id, n_lines, n_kept, n_sentences, page_kept,
    * clean_text (kept lines re-joined; filter on page_kept to drop pages).
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = 3, minSentences: Int = 3): DataFrame = {
    // staged projections: each derived array/string is aliased once and
    // the next stage reads the attribute — referencing `kept` (a line
    // filter) or `clean` (a re-join) several times in ONE projection
    // would re-evaluate them per reference (Catalyst only collapses
    // projects when reused aliases are cheap)
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val staged = df.select(col(idCol).as("id"), col(textCol).as("__t"),
        lines.as("__lines"))
      .withColumn("__kept",
        filter(col("__lines"), l => c4LineKeep(minLineWords)(l)))
      .withColumn("__clean", array_join(col("__kept"), "\n"))
      .withColumn("__nsent",
        size(regexp_extract_all(col("__clean"), lit("[.!?]"), lit(0))))
    staged.select(col("id"),
      size(col("__lines")).cast(LongType).as("n_lines"),
      size(col("__kept")).cast(LongType).as("n_kept"),
      col("__nsent").cast(LongType).as("n_sentences"),
      (col("__nsent") >= minSentences &&
        !lower(col("__t")).contains("lorem ipsum") &&
        !col("__t").contains("{")).as("page_kept"),
      col("__clean").as("clean_text"))
  }

  /** The C4 per-line survival predicate — the single source of truth for
    * [[c4Clean]] (batch) and [[c4Metrics]] (per-row / streaming).
    */
  private def c4LineKeep(minLineWords: Int)(l: Column): Column =
    size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minLineWords &&
      l.rlike("[.!?\"']$") &&
      !lower(l).contains("javascript")

  /** Per-row Column form of [[c4Clean]] for streaming gates:
    * struct(page_kept, clean_text) with let-bound stages — a pure
    * stateless projection (`StreamingFrame.c4Gate`).
    */
  def c4Metrics(c: Column, minLineWords: Int = 3,
                minSentences: Int = 3): Column = {
    import graft.util.Columns.letBind
    letBind(filter(transform(split(c, "\n"), l => trim(l)),
      l => c4LineKeep(minLineWords)(l))) { kept =>
      letBind(array_join(kept, "\n")) { clean =>
        val nSent = size(regexp_extract_all(clean, lit("[.!?]"), lit(0)))
        struct(
          (nSent >= minSentences &&
            !lower(c).contains("lorem ipsum") &&
            !c.contains("{")).as("page_kept"),
          clean.as("clean_text"))
      }
    }
  }

  private def markerScore(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words: _*)))

  /** Language-ID heuristic: CJK codepoints → zh; otherwise the language with
    * the highest marker-word count (priority order on ties), unknown when no
    * marker hits.
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, words) => lang -> markerScore(c, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cases = scores.foldLeft(when(c.rlike(CjkRegex), "zh")) {
      case (acc, (lang, s)) => acc.when(s === best && s > 0, lang)
    }
    cases.otherwise("unknown")
  }

  /** Unicode normalization of a text column — NFC/NFKC/NFD/NFKD plus
    * optional diacritic stripping. Uses the native codegen'd
    * [[graft.expressions.NormalizeText]] when [[graft.GraftExtensions]] is
    * installed (ASCII rows return without a copy); falls back to a scala
    * UDF over the same static kernel otherwise — identical output either
    * way.
    */
  def normalizeText(c: Column, form: String = "NFC",
                    stripAccents: Boolean = false): Column = {
    val native =
      try org.apache.spark.sql.SparkSession.active.catalog
        .functionExists("ww_normalize_text")
      catch { case _: Throwable => false }
    if (native)
      call_function("ww_normalize_text", c, lit(form), lit(stripAccents))
    else {
      val f = udf((s: String) =>
        if (s == null) null
        else graft.expressions.NormalizeText.norm(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.unsafe.types.UTF8String.fromString(form),
          stripAccents).toString)
      f(c)
    }
  }

  /** Whole-document fingerprint: md5 of whitespace-normalized lowercase text.
    * Cross-engine reproducible (md5 is universal).
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")))

  /** Winnowing fingerprint (Schleimer, Wilkerson, Aiken 2003): k-gram rolling
    * hashes, minimum per sliding window, distinct selected hashes. Used for
    * robust near-dup document signatures; array of selected hash values.
    */
  def winnowingFingerprint(c: Column, k: Int = 5, window: Int = 4): Column = {
    // let-bind the token and gram arrays (util.Columns.letBind): a lambda
    // BODY's subexpressions re-evaluate per element (HOFs hoist nothing),
    // so referencing the raw tokenization inside the position lambdas
    // would re-run the regex O(positions·k) times — and slicing a
    // computed gram array inside the window lambda would rebuild every
    // gram per window. Lambda variables are plain slot reads.
    import graft.util.Columns.letBind
    letBind(tokens(c)) { toks =>
      val n = size(toks)
      val grams = when(n >= k,
        transform(sequence(lit(1), n - (k - 1)), i =>
          xxhash64(concat_ws(" ",
            (0 until k).map(j => element_at(toks, i + j)): _*))))
        // short docs hash the NORMALIZED token join, matching gram
        // identity (hashing raw text would make short-doc near-dup
        // case-sensitive)
        .otherwise(array(xxhash64(array_join(toks, " "))))
      letBind(grams) { g =>
        val m = size(g)
        val mins = when(m >= window,
          transform(sequence(lit(1), m - (window - 1)), i =>
            array_min(slice(g, i, lit(window)))))
          .otherwise(array(array_min(g)))
        array_sort(array_distinct(mins))
      }
    }
  }

  /** Winnowing fingerprints as an exploded table (id, fp) — the hot-path
    * shape: the tokenizer runs once per row, k-grams come from window lead()
    * (codegen; no HOF re-inlining), the per-window minimum is a frame-bounded
    * window min, and selected fingerprints are md5 STRINGS so the identical
    * construction runs in any engine (min = lexicographic min).
    */
  def winnowingTable(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 5, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksOf = tokens(col(textCol))
    val base = df.where(size(toksOf) >= k)
      .select(col(idCol).as("id"), posexplode(toksOf).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    val grams = base
      .withColumn("g",
        md5(concat_ws(" ", (0 until k).map(j => lead(col("tok"), j).over(w)): _*)))
      .withColumn("last", lead(col("tok"), k - 1).over(w))
      .where(col("last").isNotNull)
      .select(col("id"), col("pos"), col("g"))
    val wMin = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    val wLead = Window.partitionBy("id").orderBy("pos")
    val marked = grams
      .withColumn("wmin", min(col("g")).over(wMin))
      .withColumn("wfull", lead(col("g"), window - 1).over(wLead))
    // valid window starts; docs with fewer than `window` grams contribute the
    // minimum of all their grams; docs with fewer than k tokens fingerprint
    // their whole normalized text
    val windowed = marked.where(col("wfull").isNotNull)
      .select(col("id"), col("wmin").as("fp"))
    val shortGrams = marked
      .groupBy("id").agg(count(lit(1)).as("m"), min(col("g")).as("fp"))
      .where(col("m") < window).select(col("id"), col("fp"))
    val shortDocs = df.where(size(toksOf) < k)
      .select(col(idCol).as("id"), md5(array_join(toksOf, " ")).as("fp"))
    windowed.unionAll(shortGrams).unionAll(shortDocs).distinct()
  }

  /** Unanchored (in-text scanning) variants of the config validation
    * regexes, for PII detection over document text. The ipv4 scan is
    * word-bounded so "10.0.0.123" counts once rather than splitting.
    */
  def piiPatterns: Seq[(String, String)] = {
    val opts = graft.config.WwConfig.options
    Seq(
      "emails" -> opts.emailInferenceRegex.stripPrefix("^").stripSuffix("$"),
      "urls" -> opts.urlInferenceRegex,
      "ips" -> ("\\b(?:" +
        opts.ipv4InferenceRegex.stripPrefix("^").stripSuffix("$") + ")\\b"),
      "phones" -> opts.phoneInferenceRegex.stripSuffix("$"))
  }

  /** Per-document PII pattern hit counts (emails, urls, ips, phones) — the
    * standard pre-training scrub signal. Pure regexp_count projection: no
    * shuffle, fully codegen'd, linear scan at any scale.
    */
  def piiCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: piiPatterns.map { case (nm, pat) =>
      regexp_count(col(textCol), lit(pat)).cast(LongType).as(nm)
    }: _*)

  /** Placeholder tokens for [[redactPii]], keyed like [[piiPatterns]].
    * URLs redact FIRST (an email-shaped substring can live inside a URL);
    * the chain order is part of the operator contract.
    */
  val PiiPlaceholders: Seq[(String, String)] = Seq(
    "urls" -> "[URL]", "emails" -> "[EMAIL]", "ips" -> "[IP]",
    "phones" -> "[PHONE]")

  /** PII redaction: replace every pattern hit with its placeholder — the
    * scrub step of a pre-training pipeline. Pure regexp_replace chain (one
    * projection, streams as-is).
    */
  def redactPii(c: Column): Column = {
    val pats = piiPatterns.toMap
    PiiPlaceholders.foldLeft(c) { case (acc, (nm, ph)) =>
      regexp_replace(acc, pats(nm), ph)
    }
  }

  /** Corpus-level boilerplate line detection: lines (split on `sep`)
    * appearing in at least `minDocs` DISTINCT documents. One hash-groupBy on
    * the line — the canonical 100 TB boilerplate-removal shape (explode is
    * linear, the shuffle key is the line hash, and the output is only the
    * repeated tail).
    */
  def duplicateLines(df: DataFrame, idCol: String, textCol: String,
                     minDocs: Int = 2, sep: String = "\n"): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as("line"))
      .select(col("id"), trim(col("line")).as("line"))
      .where(col("line") =!= "")
      .groupBy(col("line"))
      .agg(count_distinct(col("id")).as("n_docs"), count(lit(1)).as("n_lines"))
      .where(col("n_docs") >= minDocs)

  /** C4-style repeated-line removal: strips, from EVERY document, each line
    * whose trimmed form appears in at least `minDocs` distinct documents
    * (the [[duplicateLines]] detection turned into the transform — Raffel
    * et al. 2020 §2.2 dedup the corpus at the line level before training).
    *
    * Plan shape for 100 TB: the repeated-line table is tiny relative to the
    * corpus (it IS the boilerplate tail), so removal is a broadcast
    * left-anti join — the exploded corpus streams map-side; the only full
    * shuffles are the line-count groupBy (key = line) and the per-document
    * reassembly groupBy (key = id). Reassembly sorts each document's
    * surviving lines by original position inside a bounded per-row array,
    * not a corpus-wide sort.
    *
    * Output: (id, clean_text, n_kept, n_removed); documents whose every
    * line was boilerplate survive with empty text, keeping the row set
    * stable for downstream joins.
    */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                           minDocs: Int = 2, sep: String = "\n"): DataFrame = {
    val sepQ = java.util.regex.Pattern.quote(sep)
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), sepQ)).as(Seq("pos", "line")))
    val bad = lines
      .select(trim(col("line")).as("bad_line"), col("id"))
      .where(col("bad_line") =!= "")
      .groupBy(col("bad_line"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("bad_line"))
    // no broadcast hint: the repeated-line set is usually small but is
    // UNBOUNDED (every common short line qualifies at minDocs=2 on a big
    // crawl) — AQE picks broadcast when it actually fits
    val kept = lines.join(bad,
      trim(col("line")) === col("bad_line"), "left_anti")
    val agg = kept.groupBy(col("id")).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line")), sep).as("clean_text"),
      count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id"),
        // null text explodes to no lines; count it as zero, not SQL-null
        // (or -1 under legacy sizeOfNull)
        when(col(textCol).isNull, lit(0))
          .otherwise(size(split(col(textCol), sepQ)))
          .cast(LongType).as("n_lines"))
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Per-document n-gram repetition score: 1 − distinct/total word n-grams
    * (0 = no repetition) — the classic "repetitious junk" quality signal.
    * Exploded windowed grams (duplicates KEPT, unlike the shingle table) so
    * the tokenizer runs once per row and the count agg stays in codegen;
    * documents with fewer than n tokens score 0.
    */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksOf = tokens(col(textCol))
    val base = df.where(size(toksOf) >= n)
      .select(col(idCol).as("id"), posexplode(toksOf).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    val grams = base
      .withColumn("g",
        concat_ws(" ", (0 until n).map(j => lead(col("tok"), j).over(w)): _*))
      .withColumn("last", lead(col("tok"), n - 1).over(w))
      .where(col("last").isNotNull)
    val scored = grams.groupBy("id")
      .agg(round(lit(1.0) -
          count_distinct(col("g")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 4)
        .as("repetition"))
    val short = df.where(size(toksOf) < n)
      .select(col(idCol).as("id"), lit(0.0).as("repetition"))
    scored.unionAll(short)
  }

  /** Per-document text statistics table. */
  def textStats(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.select(
      col("*"),
      tokenCount(c).as("token_count"),
      charCount(c).as("char_count"),
      punctCount(c).as("punct_count"),
      stopwordHits(c).as("stopword_hits"),
      qualityScore(c).as("quality_score"),
      langId(c).as("lang_pred"),
      fingerprint(c).as("fingerprint"))
  }

  // ------------------------------------------------------------ oracle SQL
  /** DuckDB expressions mirroring the Column expressions above, generated
    * from the same constants.
    */
  object Sql {
    def toks(e: String) = s"regexp_extract_all(lower($e), '\\S+')"
    def tokenCount(e: String) = s"CAST(length(${toks(e)}) AS BIGINT)"
    def bpeTokenCount(e: String) =
      s"CAST(length(regexp_extract_all($e, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT)"
    def charCount(e: String) = s"CAST(length($e) AS BIGINT)"
    def punctCount(e: String) =
      s"CAST(length($e) - length(regexp_replace($e, '[.,!?;:]', '', 'g')) AS BIGINT)"
    private def inList(words: Seq[String]) =
      words.map(w => s"'$w'").mkString("(", ",", ")")
    def stopwordHits(e: String) =
      s"CAST(len(list_filter(${toks(e)}, t -> t IN ${inList(Stopwords)})) AS BIGINT)"
    def qualityScore(e: String) =
      s"""(CASE WHEN ${tokenCount(e)} > 0 THEN round(
         | least(CAST(${stopwordHits(e)} AS DOUBLE)/CAST(${tokenCount(e)} AS DOUBLE)*3.0, 1.0)*0.4 +
         | (CASE WHEN CAST(${charCount(e)} AS DOUBLE)/CAST(${tokenCount(e)} AS DOUBLE) BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)*0.3 +
         | least(CAST(${tokenCount(e)} AS DOUBLE)/100.0, 1.0)*0.3, 4) ELSE 0.0 END)""".stripMargin
    def markerScore(e: String, words: Seq[String]) =
      s"len(list_filter(${toks(e)}, t -> t IN ${inList(words)}))"
    def langId(e: String): String = {
      val scores = LangMarkers.map { case (l, ws) => l -> markerScore(e, ws) }
      val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
      val whens = scores.map { case (l, s) =>
        s"WHEN $s = $best AND $s > 0 THEN '$l'"
      }.mkString(" ")
      s"(CASE WHEN regexp_matches($e, '[\\x{4e00}-\\x{9fff}]') THEN 'zh' $whens ELSE 'unknown' END)"
    }
    def fingerprint(e: String) =
      s"md5(trim(regexp_replace(lower($e), '\\s+', ' ', 'g')))"

    /** [[TextAnalysis.gopherRules]] reproduced in DuckDB — identical rule
      * arithmetic over the same regex token/line splits.
      */
    def gopherRules(table: String, idCol: String, textCol: String,
                    minWords: Long, maxWords: Long): String = {
      // LIST literal, not the IN-tuple shape: list_intersect needs [...]
      val stopList = GopherStopwords.map(w => s"'$w'")
        .mkString("[", ",", "]")
      s"""WITH g AS (
         | SELECT $idCol AS id, $textCol AS t,
         |   regexp_extract_all($textCol, '\\S+') AS toks,
         |   CAST(length(regexp_replace($textCol, '\\s', '', 'g')) AS DOUBLE) AS nonws,
         |   string_split($textCol, chr(10)) AS lines
         | FROM $table),
         |f AS (
         | SELECT id,
         |   CAST(len(toks) AS BIGINT) AS word_count,
         |   CAST(len(toks) AS DOUBLE) AS wc,
         |   nonws,
         |   CAST(length(t) - length(replace(t, '#', '')) AS DOUBLE) AS hashes,
         |   CAST((length(t) - length(replace(t, '...', ''))) / 3 AS DOUBLE) AS ellipses,
         |   CAST(len(lines) AS DOUBLE) AS lc,
         |   CAST(len(list_filter(lines, l -> NOT (starts_with(ltrim(l), chr(8226))
         |     OR starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))) AS DOUBLE) AS non_bullet,
         |   CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
         |     OR ends_with(rtrim(l), chr(8230)))) AS DOUBLE) AS ell_end,
         |   CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) AS alpha_words,
         |   CAST(len(list_intersect(list_distinct(list_transform(toks, w -> lower(w))), $stopList)) AS BIGINT) AS stop_hits
         | FROM g)
         |SELECT id, word_count,
         |  word_count >= $minWords AND word_count <= $maxWords AS ok_word_count,
         |  CASE WHEN word_count > 0 THEN nonws / wc BETWEEN 3.0 AND 10.0 ELSE false END AS ok_mean_word_len,
         |  CASE WHEN word_count > 0 THEN (hashes + ellipses) / wc <= 0.1 ELSE false END AS ok_symbol_ratio,
         |  non_bullet / lc >= 0.9 AS ok_bullet_lines,
         |  ell_end / lc <= 0.3 AS ok_ellipsis_lines,
         |  CASE WHEN word_count > 0 THEN alpha_words / wc >= 0.8 ELSE false END AS ok_alpha_words,
         |  stop_hits >= 2 AS ok_stopwords,
         |  (word_count >= $minWords AND word_count <= $maxWords)
         |    AND (CASE WHEN word_count > 0 THEN nonws / wc BETWEEN 3.0 AND 10.0 ELSE false END)
         |    AND (CASE WHEN word_count > 0 THEN (hashes + ellipses) / wc <= 0.1 ELSE false END)
         |    AND non_bullet / lc >= 0.9
         |    AND ell_end / lc <= 0.3
         |    AND (CASE WHEN word_count > 0 THEN alpha_words / wc >= 0.8 ELSE false END)
         |    AND stop_hits >= 2 AS pass
         |FROM f ORDER BY id""".stripMargin
    }
  }
}
