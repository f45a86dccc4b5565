package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dev probe (r16): q123 releaseFunnel stage breakdown — which stage of
  * the funnel owns the ~4.4 s (gate, fingerprint dedup, keep-best
  * minhash, decontamination, packing, or the stat passes)?
  */
object ProbeQ123 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(label: String)(f: => Any): Unit = {
      f
      println(f"[q123] $label%-22s ${(1 to 3).map(_ => t(f)).min}%6.2fs")
    }
    val k = col("doc_id").cast(StringType)
    val docs = Queries.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        concat(lit("the a"), k, lit(" and b"), k, lit(" of c"), k,
          lit(" it d"), k, lit(" "), col("text")).as("text"))
    val corpus = docs.where(col("doc_id") >= 100)
    val bench = docs.where(col("doc_id") < 100)
    println("[q123] corpus rows = " + corpus.count())
    val s0 = corpus.select(col("doc_id").as("id"), col("source"),
      col("text"))
    best("s0-stat (count+tok)") {
      s0.agg(count(lit(1)),
        coalesce(sum(ops.TextAnalysis.tokenCount(col("text"))), lit(0L)))
        .head()
    }
    best("s1-gate noop") {
      noop(s0.where(ops.TextAnalysis.gopherPass(col("text"), 50L)))
    }
    val s1 = s0.where(ops.TextAnalysis.gopherPass(col("text"), 50L))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(ops.TextAnalysis.fingerprint(col("text")))
      .orderBy(col("id"))
    val s2t = s1.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .withColumn("__tok", ops.TextAnalysis.tokenCount(col("text")))
    best("s2-fingerprint noop") { noop(s2t) }
    val s2c = s2t.persist()
    s2c.count()
    best("s3-keepbest noop") {
      noop(ops.Dedup.deduplicateKeepBest(s2c, "id", "text", "__tok",
        threshold = 0.6))
    }
    val s3 = ops.Dedup.deduplicateKeepBest(s2c, "id", "text", "__tok",
      threshold = 0.6).persist()
    s3.count()
    val benchStd = bench.select(col("doc_id").as("id"),
      col("text"))
    best("s4-contaminated noop") {
      noop(ops.Dedup.crossMinhashMatches(s3, benchStd, "id", "text",
        threshold = 0.5))
    }
    best("full query toRdd") {
      Queries.all("q123_release_funnel")(spark, dir)
        .queryExecution.toRdd.count()
    }
    s3.unpersist(); s2c.unpersist()
    spark.stop()
  }
}
