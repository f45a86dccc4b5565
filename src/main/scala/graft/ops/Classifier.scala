package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed multinomial Naive Bayes over whitespace tokens — the classic
  * fastText-shaped quality/language classifier of a pretraining pipeline
  * (train on a labeled subset, score the corpus), built entirely from
  * groupBy/join aggregates so training is one shuffle over the token table
  * and scoring is a broadcast join — no MLlib iteration, no driver-side
  * feature matrix.
  *
  * The reference (alteryx/woodwork) has no model operators; this is part of
  * the beyond-reference training-data surface (SURVEY.md §2.12).
  *
  * Determinism contract: every log-likelihood is stored in FIXED-POINT
  * micro-nats (`round(ln(p) * 1e6)` as BIGINT). Summing longs is exact and
  * order-independent, so scores hash-match bit-for-bit across engines,
  * partitionings, and retries — unlike a double sum, whose value depends on
  * aggregation order. (A last-ulp `ln` divergence between libm
  * implementations would need to land exactly on a 0.5 micro-nat boundary
  * to break this — negligible.)
  *
  * Plan shape for 100 TB: the token table is linear in the corpus; training
  * aggregates shuffle on (label, token) then label; the model (vocab ×
  * classes) is small enough to broadcast for scoring (a 1M-token vocab ×
  * 10 classes is tens of MB), so the scoring pass is map-side only plus the
  * final per-document aggregation shuffle on the document id.
  */
object Classifier {

  /** Scale for fixed-point micro-nat log-likelihoods. */
  val MicroNats = 1e6

  private def unats(p: org.apache.spark.sql.Column) =
    round(log(p) * MicroNats).cast(LongType)

  /** Train: returns (weights, classes).
    *
    * weights: (label, tok, w) — w = round(ln((cnt+1)/(classTokens+V))·1e6),
    * add-one smoothing over the training vocabulary of size V.
    * classes: (label, prior, default_w) — prior = round(ln(nDocs/N)·1e6),
    * default_w the unseen-token weight round(ln(1/(classTokens+V))·1e6).
    */
  def trainNaiveBayes(df: DataFrame, labelCol: String,
                      textCol: String): (DataFrame, DataFrame) = {
    val toks = df.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    // two driver scalars (one job each over already-small aggregates):
    // vocabulary size and total labeled docs
    val v = counts.select(col("tok")).distinct().count()
    val n = df.count()
    require(n > 0, "empty training set")
    require(v > 0, "training set has no tokens")
    val classTotals = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("class_tokens"))
    val docCounts = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val classes = classTotals.join(docCounts, Seq("label"))
      .select(col("label"),
        unats(col("n_docs").cast(DoubleType) / lit(n.toDouble)).as("prior"),
        unats(lit(1.0) /
          (col("class_tokens") + lit(v)).cast(DoubleType)).as("default_w"))
    val weights = counts.join(classTotals, Seq("label"))
      .select(col("label"), col("tok"),
        unats((col("cnt") + lit(1)).cast(DoubleType) /
          (col("class_tokens") + lit(v)).cast(DoubleType)).as("w"))
    (weights, classes)
  }

  /** Score: per document, the argmax class of prior + Σ token weights
    * (unseen tokens take the class default). Ties break on ascending label.
    *
    * Output: (id, pred, score) — score in micro-nats (BIGINT). Documents
    * with no tokens get the best prior alone.
    */
  def scoreNaiveBayes(corpus: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, classes: DataFrame): DataFrame = {
    val docToks = corpus.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val perClass = docToks
      .crossJoin(broadcast(classes.select(col("label"), col("default_w"))))
      .join(broadcast(weights), Seq("label", "tok"), "left")
      .select(col("id"), col("label"),
        coalesce(col("w"), col("default_w")).as("w"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("w")).as("ll"))
    // empty documents still score: start every (doc, class) from the prior
    val base = corpus.select(col(idCol).as("id"))
      .crossJoin(broadcast(classes.select(col("label"), col("prior"))))
    val scored = base.join(perClass, Seq("id", "label"), "left")
      .select(col("id"), col("label"),
        (col("prior") + coalesce(col("ll"), lit(0L))).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("label").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("label").as("pred"), col("score"))
  }

  /** Collected model for per-row scoring: label → (prior, default_w,
    * token → w). Bounded by vocab × classes — the collect is the model
    * itself, not data.
    */
  case class NbModel(classes: Seq[(String, Long, Long)],
                     weights: Map[String, Map[String, Long]]) extends Serializable

  def collectModel(weights: DataFrame, classes: DataFrame): NbModel = {
    val cs = classes.collect().map(r => (r.getAs[String]("label"),
      r.getAs[Long]("prior"), r.getAs[Long]("default_w"))).toSeq.sortBy(_._1)
    val ws = weights.collect()
      .groupBy(_.getAs[String]("tok"))
      .map { case (tok, rows) =>
        tok -> rows.map(r =>
          r.getAs[String]("label") -> r.getAs[Long]("w")).toMap
      }
    NbModel(cs, ws)
  }

  /** Stateless per-row argmax scorer over a collected model — the shape a
    * STREAMING ingest gate needs (no explode, no join, no state): one UDF
    * call per row against the broadcast model. Identical arithmetic and
    * tie-break to [[scoreNaiveBayes]] (exact long sums), so batch and
    * streaming paths agree bit-for-bit.
    */
  private val TokenRegex = "\\S+".r

  /** JVM-side twin of [[TextAnalysis.tokens]] (lowercase whitespace
    * tokens) for per-row UDF scorers. Locale.ROOT matches Spark's
    * locale-independent `lower()` — a default-locale lowercase would break
    * the bit-for-bit batch/streaming agreement on e.g. a Turkish-locale
    * JVM ('I' → 'ı').
    */
  private[ops] def tokenize(s: String): Array[String] =
    if (s == null) Array.empty[String]
    else TokenRegex.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toArray

  def predictExpr(model: NbModel)
                 (text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = udf { (s: String) =>
      val toks = tokenize(s)
      var bestLabel: String = null
      var bestScore = Long.MinValue
      for ((label, prior, defaultW) <- model.classes) {
        var score = prior
        for (t <- toks)
          score += model.weights.get(t).flatMap(_.get(label)).getOrElse(defaultW)
        // ascending-label tie-break: classes iterate sorted, strict >
        if (score > bestScore) { bestScore = score; bestLabel = label }
      }
      bestLabel
    }
    f(text)
  }
}
