package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.frame.WoodworkFrame
import graft.schema.SchemaMetadata

/** Bucketed storage for co-located joins — the ahead-of-time answer to the
  * biggest shuffle at 100 TB.
  *
  * Writing a fact table bucketed (and sorted) by its join key means every
  * subsequent join or aggregation on that key is EXCHANGE-FREE: Spark reads
  * each bucket as a pre-partitioned split, two tables bucketed the same way
  * join bucket-to-bucket with no shuffle on either side (sort-merge without
  * the sort when sortBy matches). Profiling or deduplicating the same
  * corpus daily re-pays the shuffle every run unless it is bucketed once.
  *
  * Bucketed tables live in the session catalog (bucket metadata has no
  * path-only representation); typing info rides in StructField.metadata
  * exactly as with parquet paths, so frames round-trip fully typed.
  */
object Bucketing {

  /** Write a typed frame as a bucketed (+ optionally sorted) catalog table. */
  def writeBucketed(frame: WoodworkFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Seq.empty,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "at least one bucket column required")
    val w = frame.df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.format("parquet").saveAsTable(table)
  }

  /** Read a bucketed table back as a typed frame (typing recovered from the
    * column metadata the writer embedded).
    */
  def readBucketed(spark: SparkSession, table: String): WoodworkFrame = {
    val df = spark.table(table)
    SchemaMetadata.recover(df) match {
      case Some(schema) => WoodworkFrame(df, schema)
      case None => WoodworkFrame.init(df)
    }
  }
}
