package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-substring deduplication at the span level (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): find, for
  * every document, the token spans whose content appears elsewhere in the
  * corpus (or again in the same document), by hashing every overlapping
  * word `k`-gram and keeping grams whose hash occurs at least twice
  * globally. Overlapping duplicated grams are merged into maximal spans —
  * the unit a removal pass would cut.
  *
  * The reference (alteryx/woodwork) has no corpus operators; this is part
  * of the beyond-reference training-data surface (SURVEY.md §2.12).
  *
  * Plan shape for 100 TB — the suffix-array of the paper is replaced by
  * the shuffle-native equivalent:
  *   1. gram table: posexplode + per-doc window lead — linear, no shuffle
  *      beyond the per-doc window (key = id);
  *   2. duplicated-gram set: one hash groupBy on the 32-byte md5 key with
  *      map-side partial counts, filtered to count ≥ 2 (the output is only
  *      the duplicated tail, tiny relative to the gram table);
  *   3. marking: a shuffle semi-join of the gram table against the
  *      duplicated set on the same key (co-partitioned with step 2 under
  *      AQE, no second full shuffle of the big side in practice);
  *   4. span merge: classic gaps-and-islands per document — lag + running
  *      sum inside a per-doc window, never materializing a document's
  *      grams outside the window sort's spill machinery.
  * Nothing is all-pairs and no driver-side state exists, so the same plan
  * survives a 1000-executor corpus.
  */
object SpanDedup {

  /** Per-document duplicated-span statistics.
    *
    * Output: (id, n_tokens, dup_spans, dup_tokens, dup_ratio) — one row per
    * input document (docs with no duplicated span report zeros); dup_tokens
    * counts token positions covered by at least one duplicated `k`-gram;
    * dup_ratio = dup_tokens / n_tokens rounded to 4 places.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 10): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val grams = Corpus.gramTable(df, idCol, textCol, k)
      .select(col("id"), col("pos"), md5(col("gram")).as("g"))
    // duplicated grams: any hash seen at least twice corpus-wide (a repeat
    // within one document counts — the paper removes those too)
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
      .select(col("g"))
    val hits = grams.join(dup, Seq("g"), "left_semi")
    // gaps-and-islands: a new span starts when this gram's coverage
    // [pos, pos+k-1] no longer touches the previous covered range; with
    // equal-length intervals sorted by pos that is pos > lag(pos) + k
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val islands = hits
      .withColumn("new_span",
        when(col("pos") > lag(col("pos"), 1).over(w) + k, 1)
          .otherwise(when(lag(col("pos"), 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("span", sum(col("new_span")).over(w))
    val spans = islands.groupBy(col("id"), col("span"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(k - 1)).as("e"))
    val perDoc = spans.groupBy(col("id"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
    df.select(col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 4))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  /** The removal pass: cut every duplicated span (as found by
    * [[repeatedSpans]]) out of each document, keeping the first occurrence
    * corpus-wide is NOT attempted — like the paper's released tool, every
    * occurrence of a duplicated substring is removed, which keeps the
    * operator embarrassingly parallel (no global "who was first" ordering,
    * which would serialize the corpus at 100 TB).
    *
    * Gram identity is case-insensitive (matching [[repeatedSpans]]) but
    * surviving text keeps its ORIGINAL casing; inter-token whitespace
    * collapses to single spaces (token-level surgery cannot preserve the
    * original separators around a cut).
    *
    * Output: (id, clean_text, n_tokens, kept_tokens).
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 10): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val grams = Corpus.gramTable(df, idCol, textCol, k)
      .select(col("id"), col("pos"), md5(col("gram")).as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 2)
      .select(col("g"))
    val hits = grams.join(dup, Seq("g"), "left_semi")
    // covered token positions, exploded per duplicated gram: k rows per hit
    // is bounded (k is a small constant) and stays linear in corpus size
    val covered = hits
      .select(col("id"), explode(sequence(col("pos"),
        col("pos") + lit(k - 1))).as("cut"))
      .distinct()
    // ORIGINAL-case tokens: positions align 1:1 with the lowercased gram
    // table (same \S+ split), so the cut set applies directly
    val toks = df
      .select(col(idCol).as("id"),
        posexplode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0)))
          .as(Seq("pos", "tok")))
    val kept = toks.join(covered,
        toks("id") === covered("id") && toks("pos") === covered("cut"),
        "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s("tok")), " ").as("clean_text"),
        count(lit(1)).as("kept_tokens"))
    df.select(col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }
}
