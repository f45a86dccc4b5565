package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer training (Sennrich, Haddow, Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") with the
  * distributed/driver split a 100 TB corpus needs:
  *
  *   - the DATA-sized stage — word frequency counting — is one Spark
  *     shuffle over the token table, truncated to the top `maxWords` most
  *     frequent words via TakeOrderedAndProject (per-task bounded heaps);
  *   - the merge loop runs driver-side over that BOUNDED frequency table,
  *     which is the standard practice (BPE trains on word counts, never
  *     the raw corpus) and the same bounded-driver-compute contract as
  *     medcouple's 10k sample and IVF's quantizer training.
  *
  * Everything is deterministic: word ties break lexicographically in the
  * count ordering, and merge ties break on the lexicographically smallest
  * (left, right) pair — so the trained merge table is a pure function of
  * the corpus and hash-stable across engines, partitionings and retries.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbols (left, right) fuse. */
  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** Top-`maxWords` word frequencies — the bounded training table. */
  def wordCounts(df: DataFrame, textCol: String,
                 maxWords: Int): Array[(String, Long)] =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))

  /** Train `numMerges` merges on the top-`maxWords` word-frequency table.
    * Stops early when no adjacent pair occurs at least twice (weighted by
    * word frequency). Words are split into single characters; merges never
    * cross word boundaries.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 10000): Seq[Merge] = {
    require(numMerges > 0, s"need numMerges > 0, got $numMerges")
    require(maxWords > 0, s"need maxWords > 0, got $maxWords")
    val wc = wordCounts(df, textCol, maxWords)
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(
          prev => Some(prev.getOrElse(0L) + c))
      // deterministic best: max count, then smallest (left, right)
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (pair, c)) => acc match {
          case Some((bp, bc))
            if bc > c || (bc == c && implicitly[Ordering[(String, String)]]
              .lteq(bp, pair)) => acc
          case _ => Some((pair, c))
        }
      }
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          merges += Merge(rank, l, r)
          val fused = l + r
          words = words.map { case (syms, cnt) =>
            if (syms.length < 2) (syms, cnt)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += fused; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, cnt)
            }
          }
          rank += 1
        case _ => continue = false
      }
    }
    merges.result()
  }

  /** Segment one word with a trained merge table: repeatedly fuse the
    * adjacent pair with the LOWEST merge rank (the standard BPE encode).
    */
  def segmentWord(word: String, rankOf: Map[(String, String), Int])
      : Array[String] = {
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue; var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
        syms.drop(bestI + 2)
    }
    syms
  }

  /** Per-row BPE piece count under a trained merge table — the real "how
    * many tokens will training see" measure (vs the regex proxy
    * [[TextAnalysis.bpeTokenCount]]). The merge table is model-sized and
    * rides the closure broadcast; scoring is a stateless projection, so
    * the same column works as a streaming gate.
    */
  def pieceCount(merges: Seq[Merge])(text: Column): Column = {
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val f = udf { (s: String) =>
      if (s == null) 0L
      else Classifier.tokenize(s).map(w => segmentWord(w, rankOf).length.toLong).sum
    }
    f(text)
  }

  /** The trained merge table as a DataFrame (rank, left, right, merged). */
  def mergesTable(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.merged))
      .toDF("rank", "left", "right", "merged")
  }
}
