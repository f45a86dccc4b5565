package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Size-balanced shard writing with a manifest — the write side of a
  * 100 TB pipeline: downstream training jobs want N similar-sized files
  * and a table of what landed where, not whatever partitioning the last
  * shuffle happened to leave.
  *
  * Sharding is `repartition(numShards, hash(id))` — one shuffle, shard
  * membership a pure function of the id (stable across retries of the
  * write stage). The manifest is built from the filesystem listing plus a
  * footer-driven row count per file (a count over parquet metadata, not a
  * data scan).
  */
object ShardWriter {

  /** Write `df` as `numShards` parquet shards under `path`; returns the
    * manifest as (file, rows, bytes), one row per shard file.
    */
  def writeShards(df: DataFrame, path: String, numShards: Int,
                  idCol: String): DataFrame = {
    require(numShards > 0, s"need numShards > 0, got $numShards")
    df.repartition(numShards, col(idCol))
      .write.mode("overwrite").parquet(path)
    manifest(df.sparkSession, path)
  }

  /** Manifest of an existing parquet directory: (file, rows, bytes). */
  def manifest(spark: SparkSession, path: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    // per-file row counts: a zero-column count compiles to a footer-rowcount
    // scan (no data pages are read)
    val rows = spark.read.parquet(path)
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg(count(lit(1)).as("rows"))
    val bytesDf = spark.createDataFrame(
      bytes.toSeq.map { case (f, b) => org.apache.spark.sql.Row(f, b) }.asJava,
      StructType(Seq(StructField("file", StringType),
        StructField("bytes", LongType))))
    rows.join(bytesDf, Seq("file"), "full")
      .select(col("file"), coalesce(col("rows"), lit(0L)).as("rows"),
        coalesce(col("bytes"), lit(0L)).as("bytes"))
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
