package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16): minhashLshPairs stage breakdown over the q22 shape —
  * buckets, candidate self-join, or the gram-set verification join?
  */
object ProbeMinhash {
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
      println(f"[mh] $label%-22s ${(1 to 3).map(_ => t(f)).min}%6.2fs")
    }
    val docs = Queries.table(spark, dir, "documents")
    println("[mh] docs = " + docs.count())
    best("buckets noop") {
      noop(ops.Dedup.bandBuckets(docs, "doc_id", "text", 3, 64, 32))
    }
    val buckets = ops.Dedup.bandBuckets(docs, "doc_id", "text", 3, 64, 32)
    best("selfPairs noop") {
      noop(ops.SkewJoin.selfPairs(buckets, Seq("band", "sig"), "id"))
    }
    best("cand distinct noop") {
      noop(ops.SkewJoin.selfPairs(buckets, Seq("band", "sig"), "id")
        .select(col("x_id").as("id_1"), col("y_id").as("id_2")).distinct())
    }
    best("full pairs noop") {
      noop(ops.Dedup.minhashLshPairs(docs, "doc_id", "text"))
    }
    spark.stop()
  }
}
