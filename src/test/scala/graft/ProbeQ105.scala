package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): q105 (IVF-OPQ) stage breakdown — the suite's #1
  * most expensive query two rounds running, never specifically audited.
  * Times each stage separately, then the staged-persist variant (the
  * rotated frame is consumed by trainCentroids AND both ivfSearchPq
  * sides, so the projection recomputes ~3× in the committed shape).
  */
object ProbeQ105 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q105] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    val emb = Queries.table(spark, dir, "embeddings")
    emb.count() // warm read
    var opq: ops.Quantize.OpqModel = null
    t("trainOpq") { opq = ops.Quantize.trainOpq(emb, "embedding",
      dim = 64, m = 8, k = 16, centered = false) }
    def rotated = emb.select(col("vec_id"),
      opq.rotateExpr(col("embedding")).as("rot"))
    t("rotate.count")(rotated.queryExecution.toRdd.count())
    var cents: Array[Array[Double]] = null
    t("trainCentroids") { cents =
      ops.Similarity.trainCentroids(rotated, "rot", k = 8) }
    t("ivfSearchPq")(ops.Similarity.ivfSearchPq(
      rotated.where(col("vec_id") < 10), rotated, "vec_id", "rot",
      cents, opq.pq, nprobe = 3, threshold = 0.3)
      .queryExecution.toRdd.count())
    // staged-persist variant: rotate once, reuse everywhere
    t("variant: checkpoint") {
      val rc = rotated.localCheckpoint()
      val c2 = ops.Similarity.trainCentroids(rc, "rot", k = 8)
      ops.Similarity.ivfSearchPq(rc.where(col("vec_id") < 10), rc,
        "vec_id", "rot", c2, opq.pq, nprobe = 3, threshold = 0.3)
        .queryExecution.toRdd.count()
    }
    // repeat both best-of-2 (warm)
    t("again: committed shape") {
      val c3 = ops.Similarity.trainCentroids(rotated, "rot", k = 8)
      ops.Similarity.ivfSearchPq(rotated.where(col("vec_id") < 10),
        rotated, "vec_id", "rot", c3, opq.pq, nprobe = 3, threshold = 0.3)
        .queryExecution.toRdd.count()
    }
    t("again: checkpoint") {
      val rc = rotated.localCheckpoint()
      val c4 = ops.Similarity.trainCentroids(rc, "rot", k = 8)
      ops.Similarity.ivfSearchPq(rc.where(col("vec_id") < 10), rc,
        "vec_id", "rot", c4, opq.pq, nprobe = 3, threshold = 0.3)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
