package graft

import java.io.File
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.functions._

import graft.frame.WoodworkFrame
import graft.io.ReadWrite
import graft.types.{LogicalType => LT}

/** A [[RawLocalFileSystem]] that answers for the `s3a://` scheme, backed by
  * the local disk — the standard Hadoop technique for exercising
  * object-store code paths in a zero-egress environment. The path mapping is
  * the identity on the path component (`s3a://bucket/p → local /p`), which
  * keeps it self-consistent with `RawLocalFileSystem`'s habit of rebuilding
  * status paths from `File.getPath` and re-qualifying them against
  * [[getUri]].
  *
  * What this proves: every byte graft moves for a remote table — the
  * Spark-committer data write, the hive-partitioned layout, the typing-info
  * sidecar, the magic-byte sniff, and the read-back — flows through the
  * Hadoop `FileSystem` abstraction (no `java.io`/`java.nio` shortcuts), so
  * swapping in the real `S3AFileSystem` is a pure configuration change.
  * What it cannot prove (zero egress): multipart-upload tuning, eventual
  * listing semantics, credentials — SURVEY §2 keeps those labeled UNTESTED.
  */
class FakeS3AFileSystem extends RawLocalFileSystem {
  private var fsUri: URI = _
  override def getScheme: String = "s3a"
  override def initialize(name: URI, conf: Configuration): Unit = {
    fsUri = URI.create(s"s3a://${name.getAuthority}")
    super.initialize(name, conf)
  }
  // the superclass CONSTRUCTOR already qualifies the working directory
  // against getUri, before initialize() has run — fall back to a bare
  // scheme URI until then
  override def getUri: URI =
    if (fsUri == null) URI.create("s3a:///") else fsUri
  override def pathToFile(path: Path): File = {
    val p = path.toUri.getPath
    require(p.startsWith("/"), s"unqualified s3a path: $path")
    new File(p)
  }
  // RawLocalFileSystem's deprecated statuses load permissions LAZILY via
  // `new File(path.toUri)`, which rejects non-file schemes — return eager
  // copies with a materialized permission instead
  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      null, null, st.getPath)
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

class S3ARoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def bucketPath(suffix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-s3a-$suffix")
    s"s3a://graft-test-bucket${dir.toAbsolutePath}"
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[FakeS3AFileSystem].getName)
    hc.set("fs.s3a.impl.disable.cache", "true")
    // the default s3a committer-factory binding points at hadoop-aws's
    // S3ACommitterFactory, which is not on this classpath — that binding
    // is deployment configuration, not graft code under test
    hc.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitterFactory")
  }

  test("toDisk/fromDisk round-trips a typed frame over s3a://") {
    val df = Seq(
      (1L, "north", "2024-01-02", 19.99),
      (2L, "south", "2024-01-03", 5.25),
      (3L, "north", "2024-01-04", 7.00)
    ).toDF("id", "zone", "day", "amount")
    val frame = WoodworkFrame.init(df, index = Some("id"),
      logicalTypes = Map("day" -> LT.Datetime()))

    val path = bucketPath("rt")
    ReadWrite.toDisk(frame, path)

    val back = ReadWrite.fromDisk(spark, path)
    assert(back.index.contains("id"))
    assert(back.schema.columns("day").logicalType.name == "Datetime")
    assert(back.df.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
    assert(math.abs(back.df.agg(sum("amount")).head.getDouble(0) - 32.24)
      < 1e-9)
  }

  test("hive-partitioned toDisk over s3a:// prunes and reads back whole") {
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i * 1.5))
      .toDF("id", "part", "v")
    val frame = WoodworkFrame.init(df, index = Some("id"))
    val path = bucketPath("hive")
    ReadWrite.toDisk(frame, path, partitionCols = Seq("part"))

    // layout is hive-style under the fake bucket
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(s"$path/data"))
      .map(_.getPath.getName).filter(_.startsWith("part=")).sorted
    assert(parts.toSeq == Seq("part=a", "part=b"))

    val back = ReadWrite.fromDisk(spark, path)
    assert(back.df.count() == 40)
    assert(back.df.where(col("part") === "a").count() == 20)
  }

  test("readFile magic-byte sniff works through the s3a FileSystem") {
    val path = bucketPath("sniff")
    // a csv written with no .csv extension: sniff must open via Hadoop FS
    val dataPath = s"$path/blob"
    Seq(("x", 1), ("y", 2)).toDF("k", "n").coalesce(1)
      .write.option("header", "true").csv(dataPath)
    val frame = ReadWrite.readFile(spark, dataPath)
    assert(frame.df.columns.toSeq == Seq("k", "n"))
    assert(frame.df.count() == 2)
  }
}
