package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.WoodworkFrame
import graft.io.{ArrowIo, ReadWrite}
import graft.types.{LogicalType => LT}

/** Feather V2 / Arrow IPC serializer: typed round-trips over every supported
  * physical type including nulls, multi-partition and multi-batch layouts,
  * and the toDisk/fromDisk integration.
  */
class ArrowIoSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("i", IntegerType),
    StructField("b", BooleanType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private def mixedDf = {
    val rows = Seq(
      Row(1L, 7, true, 1.5f, 2.25, "alpha", Array[Byte](1, 2, 3),
        Date.valueOf("2020-02-29"), Timestamp.valueOf("2020-01-01 12:34:56.789")),
      Row(2L, null, false, null, -0.5, "βeta ünïcode", null,
        null, null),
      Row(3L, -42, null, 3.5f, null, null, Array[Byte](),
        Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.0")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("write/read round-trip preserves every supported type and nulls") {
    val dir = java.nio.file.Files.createTempDirectory("arrow").toString
    ArrowIo.write(mixedDf, dir)
    val back = ArrowIo.read(spark, dir)
    assert(back.schema == schema)
    val orig = mixedDf.orderBy("id").collect()
    val rt = back.orderBy("id").collect()
    assert(rt.length == 3)
    orig.zip(rt).foreach { case (a, b) =>
      (0 until schema.length).foreach { c =>
        (a.get(c), b.get(c)) match {
          case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y))
          case (x, y) => assert(x == y, s"col ${schema(c).name}: $x != $y")
        }
      }
    }
  }

  test("multi-batch writes: partitions larger than one record batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("arrowbig").toString
    val df = (0L until 20000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(3)
    ArrowIo.write(df, dir)
    val back = ArrowIo.read(spark, dir)
    assert(back.count() == 20000L)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 20000L).sum)
    assert(back.where(col("s") === "row12345").count() == 1)
  }

  test("timestamp_ntz columns round-trip through the no-timezone arrow type") {
    val ntzSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("t", TimestampNTZType)))
    val rows = Seq(
      Row(1L, java.time.LocalDateTime.parse("2021-06-01T08:30:00.000250")),
      Row(2L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ntzSchema)
    val dir = java.nio.file.Files.createTempDirectory("arrowntz").toString
    ArrowIo.write(df, dir)
    val back = ArrowIo.read(spark, dir)
    assert(back.schema == ntzSchema)
    assert(back.orderBy("id").collect().map(_.get(1)).toSeq ==
      rows.map(_.get(1)).toSeq)
  }

  test("toDisk/fromDisk feather preserves typing via the sidecar") {
    import spark.implicits._
    val f = WoodworkFrame.init(
      Seq((1L, "a@b.com", "x", 1.5), (2L, "c@d.org", "y", 2.5))
        .toDF("id", "email", "cat", "v"),
      index = Some("id"),
      logicalTypes = Map("cat" -> LT.Categorical))
    val dir = java.nio.file.Files.createTempDirectory("wwfeather").toString
    ReadWrite.toDisk(f, dir, format = "feather")
    val back = ReadWrite.fromDisk(spark, dir, format = "feather")
    assert(back.logicalTypes == f.logicalTypes)
    assert(back.index.contains("id"))
    assert(back.df.orderBy("id").collect().toSeq ==
      f.df.orderBy("id").collect().toSeq)
  }

  test("demo loadRetail: reference schema, typing contract, nrows scaling") {
    val f = graft.io.Demo.loadRetail(spark, nrows = 300L).toOption.get
    assert(f.df.count() == 300L)
    assert(f.columnNames == Seq("order_product_id", "order_id", "product_id",
      "description", "quantity", "order_date", "unit_price", "customer_name",
      "country", "total", "cancelled"))
    assert(f.logicalTypes("description") == "NaturalLanguage")
    assert(f.logicalTypes("cancelled") == "Boolean")
    assert(f.index.contains("order_product_id"))
    assert(f.timeIndex.contains("order_date"))
    // cancelled rows carry negative totals
    import org.apache.spark.sql.functions.col
    assert(f.df.where(col("cancelled") && col("total") >= 0).count() == 0)
    // deterministic: two loads agree
    val again = graft.io.Demo.loadRetail(spark, nrows = 300L).toOption.get
    assert(f.df.exceptAll(again.df).isEmpty)
    // uninitialized variant returns the bare DataFrame
    assert(graft.io.Demo.loadRetail(spark, nrows = 10L, initWoodwork = false)
      .left.toOption.get.columns.length == 11)
  }

  test("empty frame round-trips schema through a zero-batch part file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("arrowempty").toString
    val df = Seq((1L, "x")).toDF("id", "s").where(col("id") < 0)
    ArrowIo.write(df, dir)
    val back = ArrowIo.read(spark, dir)
    assert(back.schema == df.schema)
    assert(back.count() == 0)
  }

  test("nested types are rejected with a clear message") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("arrowbad").toString
    val e = intercept[IllegalArgumentException](ArrowIo.write(df, dir))
    assert(e.getMessage.contains("parquet"))
  }
}
