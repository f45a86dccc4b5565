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

  /** Write `df` as up to `numShards` parquet shards under `path`; returns
    * the manifest as (file, rows, bytes), one row per shard file. Hash
    * partitions that receive no rows produce no file, so fewer than
    * `numShards` files can land — callers that need exactly N placeholders
    * should not rely on the file count.
    */
  def writeShards(df: DataFrame, path: String, numShards: Int,
                  idCol: String): DataFrame = {
    require(numShards > 0, s"need numShards > 0, got $numShards")
    df.repartition(numShards, col(idCol))
      .write.mode("overwrite").parquet(path)
    manifest(df.sparkSession, path)
  }

  /** Manifest of an existing parquet directory: (file, rows, bytes). Row
    * counts come straight from each file's parquet footer
    * (ParquetFileReader row-group metadata) — no row is ever read. The
    * driver loop is bounded by the shard count, and each footer read is a
    * few KB of metadata IO.
    */
  def manifest(spark: SparkSession, path: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val files = fs.listStatus(hPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val rowsOf = files.map { s =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(s, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try s.getPath.getName -> reader.getRecordCount
      finally reader.close()
    }.toMap
    val manifestRows = files.map { s =>
      org.apache.spark.sql.Row(s.getPath.getName,
        rowsOf(s.getPath.getName), s.getLen)
    }.toSeq
    spark.createDataFrame(manifestRows.asJava,
      StructType(Seq(StructField("file", StringType),
        StructField("rows", LongType), StructField("bytes", LongType))))
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
