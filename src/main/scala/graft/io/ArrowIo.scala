package graft.io

import java.nio.channels.{Channels, SeekableByteChannel}
import java.nio.ByteBuffer
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import scala.collection.JavaConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.ipc.SeekableReadChannel
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Feather V2 / Arrow IPC serializer (reference:
  * woodwork/serializers/feather_serializer.py:9, arrow_serializer.py:4 —
  * both write the Arrow IPC file format, which IS Feather V2).
  *
  * Distributed shape, same as Spark's native formats: each partition writes
  * one `part-NNNNN.arrow` file through the Hadoop FileSystem API (so any
  * Hadoop-supported target works), and reads parallelize over the part
  * files. No driver-side collect in either direction — the driver only
  * lists the directory.
  *
  * Supported column types: boolean, int, long, float, double, string,
  * binary, date, timestamp (tz and ntz). Nested types (arrays, structs)
  * should go via parquet — same restriction the reference inherits from
  * pandas-to-feather.
  */
object ArrowIo {

  private val BatchRows = 4096

  // ------------------------------------------------------------- schema map
  private def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case other => throw new IllegalArgumentException(
        s"ArrowIo does not support column '${f.name}' of type ${other.simpleString}; " +
          "write nested/complex columns via parquet")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def fromArrowField(f: Field): StructField = {
    val t: DataType = f.getType match {
      case _: ArrowType.Bool => BooleanType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.Date => DateType
      case ts: ArrowType.Timestamp if ts.getTimezone == null => TimestampNTZType
      case _: ArrowType.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(
        s"ArrowIo cannot map Arrow type $other for column '${f.getName}'")
    }
    StructField(f.getName, t, f.isNullable)
  }

  def arrowSchemaFor(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(toArrowField).toSeq.asJava)

  def sparkSchemaFor(schema: ArrowSchema): StructType =
    StructType(schema.getFields.asScala.map(fromArrowField).toSeq)

  // ------------------------------------------------------------ cell codecs
  private def micros(v: Any, ntz: Boolean): Long = v match {
    case ts: java.sql.Timestamp =>
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    case ldt: LocalDateTime =>
      ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  private def setCell(vec: FieldVector, i: Int, v: Any): Unit = v match {
    case null => vec.asInstanceOf[BaseValueVector] match {
      case fw: BaseFixedWidthVector => fw.setNull(i)
      case vw: BaseVariableWidthVector => vw.setNull(i)
      case other => throw new IllegalStateException(s"unexpected vector $other")
    }
    case b: Boolean => vec.asInstanceOf[BitVector].setSafe(i, if (b) 1 else 0)
    case n: Int => vec.asInstanceOf[IntVector].setSafe(i, n)
    case n: Long => vec.asInstanceOf[BigIntVector].setSafe(i, n)
    case n: Float => vec.asInstanceOf[Float4Vector].setSafe(i, n)
    case n: Double => vec.asInstanceOf[Float8Vector].setSafe(i, n)
    case s: String =>
      vec.asInstanceOf[VarCharVector].setSafe(i, s.getBytes("UTF-8"))
    case b: Array[Byte] => vec.asInstanceOf[VarBinaryVector].setSafe(i, b)
    case d: java.sql.Date =>
      vec.asInstanceOf[DateDayVector].setSafe(i, d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate =>
      vec.asInstanceOf[DateDayVector].setSafe(i, d.toEpochDay.toInt)
    case ts @ (_: java.sql.Timestamp | _: java.time.Instant) =>
      vec.asInstanceOf[TimeStampMicroTZVector].setSafe(i, micros(ts, ntz = false))
    case ldt: LocalDateTime =>
      vec.asInstanceOf[TimeStampMicroVector].setSafe(i, micros(ldt, ntz = true))
    case other => throw new IllegalArgumentException(
      s"ArrowIo cannot encode value of ${other.getClass}")
  }

  private def getCell(vec: FieldVector, i: Int): Any =
    if (vec.isNull(i)) null
    else vec match {
      case v: BitVector => v.get(i) == 1
      case v: IntVector => v.get(i)
      case v: BigIntVector => v.get(i)
      case v: Float4Vector => v.get(i)
      case v: Float8Vector => v.get(i)
      case v: VarCharVector => new String(v.get(i), "UTF-8")
      case v: VarBinaryVector => v.get(i)
      case v: DateDayVector => java.sql.Date.valueOf(LocalDate.ofEpochDay(v.get(i).toLong))
      case v: TimeStampMicroTZVector =>
        val us = v.get(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case v: TimeStampMicroVector =>
        val us = v.get(i)
        LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case other => throw new IllegalStateException(s"unexpected vector $other")
    }

  // ------------------------------------------------------------------ write
  /** Write `df` as a directory of Arrow IPC part files, one per partition.
    * Each task streams its rows through a reused VectorSchemaRoot in
    * [[BatchRows]]-row record batches — memory per task is one batch, not
    * one partition.
    */
  /** The session's Hadoop conf flattened for task-side rebuild — ArrowIo
    * must see the same fs.* / credentials settings as every other reader
    * (a bare `new Configuration()` drops all spark.hadoop.* config).
    */
  private def confEntries(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
    buf.toArray
  }

  private def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  def write(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    sparkSchema.fields.foreach(toArrowField) // validate types up front
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val entries = confEntries(hadoopConf)
    val dirPath = new HPath(dir)
    val fs0 = dirPath.getFileSystem(hadoopConf)
    if (fs0.exists(dirPath)) fs0.delete(dirPath, true)
    fs0.mkdirs(dirPath)
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        writePart(dir, pid, sparkSchema, rows, rebuild(entries))
        Iterator.single(1)
      }
    }.count()
    // an entirely-empty frame still round-trips: write one zero-batch part
    // so read() can recover the schema from the footer
    if (written == 0) writePart(dir, 0, sparkSchema, Iterator.empty, hadoopConf)
  }

  private def writePart(dir: String, pid: Int, sparkSchema: StructType,
                        rows: Iterator[Row], conf: Configuration): Unit = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchemaFor(sparkSchema), alloc)
    val part = new HPath(dir, f"part-$pid%05d.arrow")
    // poor-man's commit protocol: stream to a per-attempt temp file, then
    // rename into place — a speculative/zombie second attempt can no longer
    // interleave bytes into the final file; rename-to-existing loses and
    // cleans up (first attempt wins)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    val tmp = new HPath(dir, f".part-$pid%05d.arrow.$attempt.tmp")
    val fs = part.getFileSystem(conf)
    val out = fs.create(tmp, true)
    val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
    try {
      writer.start()
      val nCols = sparkSchema.length
      while (rows.hasNext) {
        root.allocateNew()
        var n = 0
        while (n < BatchRows && rows.hasNext) {
          val row = rows.next()
          var c = 0
          while (c < nCols) {
            setCell(root.getVector(c), n, row.get(c))
            c += 1
          }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally {
      writer.close(); out.close(); root.close(); alloc.close()
    }
    if (!fs.rename(tmp, part)) fs.delete(tmp, false)
  }

  // ------------------------------------------------------------------- read
  /** Seekable channel over a Hadoop input stream (Arrow's file reader needs
    * random access for the footer).
    */
  private class HdfsSeekableChannel(in: FSDataInputStream, len: Long)
      extends SeekableByteChannel {
    private var open = true
    override def read(dst: ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: ByteBuffer): Int = throw new UnsupportedOperationException
    override def position(): Long = in.getPos
    override def position(newPosition: Long): SeekableByteChannel = {
      in.seek(newPosition); this
    }
    override def size(): Long = len
    override def truncate(size: Long): SeekableByteChannel =
      throw new UnsupportedOperationException
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  /** Read a directory written by [[write]] back into a DataFrame. The
    * driver lists part files and reads only the FIRST footer for the
    * schema; row decoding is distributed over the part files.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val entries = confEntries(hadoopConf)
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(hadoopConf)
    val parts = fs.listStatus(dirPath).toSeq
      .filter(_.getPath.getName.endsWith(".arrow"))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen))
    require(parts.nonEmpty, s"no .arrow part files under $dir")
    val sparkSchema = {
      val (p0, len0) = parts.head
      val alloc = new RootAllocator()
      val in = fs.open(new HPath(p0))
      val reader = new ArrowFileReader(
        new SeekableReadChannel(new HdfsSeekableChannel(in, len0)), alloc)
      try sparkSchemaFor(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); alloc.close() }
    }
    val rdd = spark.sparkContext
      .parallelize(parts, math.min(parts.size, 64))
      .flatMap { case (p, len) =>
        val path = new HPath(p)
        val pfs = path.getFileSystem(rebuild(entries))
        val alloc = new RootAllocator()
        val reader = new ArrowFileReader(
          new SeekableReadChannel(new HdfsSeekableChannel(pfs.open(path), len)),
          alloc)
        val root = reader.getVectorSchemaRoot
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; reader.close(); alloc.close()
        }
        // partial consumption (limit/take/failure) must not leak the open
        // stream and the allocator's direct buffers — close at task end
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        new Iterator[Row] {
          private var rowIdx = 0
          private var batchRows = 0
          private var done = false
          private def advance(): Unit =
            while (!done && rowIdx >= batchRows) {
              if (reader.loadNextBatch()) {
                batchRows = root.getRowCount; rowIdx = 0
              } else {
                done = true; closeAll()
              }
            }
          override def hasNext: Boolean = { advance(); !done }
          override def next(): Row = {
            advance()
            val vals = (0 until root.getFieldVectors.size())
              .map(c => getCell(root.getVector(c), rowIdx))
            rowIdx += 1
            Row.fromSeq(vals)
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
