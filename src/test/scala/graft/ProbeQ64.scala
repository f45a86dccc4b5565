package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q64_ivf_pq time go at sf0.1. */
object ProbeQ64 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val emb = Queries.table(spark, dir, "embeddings")
    emb.count()
    val centroids = time("trainCentroids") {
      ops.Similarity.trainCentroids(emb, "embedding", k = 8)
    }
    val pq = time("trainPq") {
      ops.Quantize.trainPq(emb, "embedding", dim = 64, m = 8, k = 16)
    }
    val df = time("build plan") {
      ops.Similarity.ivfSearchPq(emb.where(col("vec_id") < 10), emb,
        "vec_id", "embedding", centroids, pq, nprobe = 3, threshold = 0.3)
    }
    time("first count")(df.count())
    time("second count")(df.count())
    val enc = ops.Quantize.pqEncode(emb, "embedding", pq)
    time("encode only count")(enc.select(sum(element_at(col("codes"), 1))).head())
    spark.stop()
  }
}
