package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Video frame sampling over opaque binary payload columns.
  *
  * The Spark-side plumbing is fully real: container metadata comes from
  * [[VideoMeta]]'s byte-level MP4/AVI parsers, frame timestamps are exact
  * integer midpoints of `n` equal duration slices, and each sampled frame
  * seeks into the container's encoded-sample section. For MP4s carrying
  * complete sample tables the seek is FRAME-ACCURATE — the timestamp maps
  * through `stts`/`stsz`/`stsc`/`stco` to the exact sample byte range and
  * decode time a real demuxer would produce; otherwise a proportional
  * offset into `mdat` / `LIST movi` stands in. Rows explode one-to-n
  * inside `mapPartitions` (executor-side, batch-shaped, no shuffle), so at
  * 100 TB this is a linear map stage.
  *
  * STUB — frame pixel decode: turning the seeked bytes into pixels needs
  * an H.264/VP9 codec, which this zero-dependency JVM build deliberately
  * does not ship. [[probeByte]] stands in for the decoder: a deterministic
  * 1-byte probe at the seek offset. Swapping in a real codec means
  * replacing that single function; every schema/partitioning/explosion
  * contract stays as-is.
  */
object Video {

  /** Midpoint timestamp (ms, floor) of slice `i` of `n` equal slices. */
  @inline def frameTsMs(durationMs: Long, i: Int, n: Int): Long =
    durationMs * (2L * i + 1) / (2L * n)

  /** Proportional byte offset of `tsMs` within the data section. */
  @inline def seekOffset(info: VideoMeta.VideoInfo, tsMs: Long): Long =
    if (info.dataSize <= 0) -1L
    else info.dataOffset + math.min(info.dataSize - 1,
      tsMs * info.dataSize / math.max(1L, info.durationMs))

  /** STUB decoder: the byte at the seek offset (0..255), -1 when the
    * container has no data section. Replace with codec output to get real
    * frames; all callers only depend on "deterministic value per seek".
    */
  @inline def probeByte(payload: Array[Byte], off: Long): Int =
    if (off < 0 || off >= payload.length) -1 else payload(off.toInt) & 0xFF

  private val frameFields = Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("probe_offset", LongType, nullable = false),
    StructField("probe_byte", IntegerType, nullable = false),
    StructField("sample_idx", IntegerType, nullable = true),
    StructField("sample_ts_ms", LongType, nullable = true),
    StructField("sample_offset", LongType, nullable = true),
    StructField("sample_size", LongType, nullable = true),
    StructField("sample_byte", IntegerType, nullable = true))

  /** Explode each video payload row into `n` evenly spaced sampled frames.
    * Output = input columns + (frame_idx, ts_ms, probe_offset, probe_byte,
    * sample_idx, sample_ts_ms, sample_offset, sample_size, sample_byte);
    * rows whose payload is not a parseable MP4/AVI container yield zero
    * frames (they are reported by [[describeVideos]] instead).
    *
    * When the container carries complete MP4 sample tables
    * (`stts`/`stsz`/`stsc`/`stco` — [[VideoMeta.SampleTable]]), the
    * `sample_*` columns are FRAME-ACCURATE: the frame timestamp maps
    * through the media timescale to the sample being decoded at that
    * instant, reporting its true byte offset/length in the payload and its
    * exact decode timestamp — what a real demuxer would hand the codec.
    * Without tables (AVI, table-less MP4) they are null and the
    * proportional `probe_*` seek remains the estimate.
    */
  def sampleFrames(df: DataFrame, n: Int,
                   payloadCol: String = "payload"): DataFrame = {
    require(n > 0, s"need n > 0 frames, got $n")
    val schema = StructType(df.schema.fields ++ frameFields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        VideoMeta.decode(bytes) match {
          case Some(info) =>
            (0 until n).iterator.map { i =>
              val ts = frameTsMs(info.durationMs, i, n)
              val off = seekOffset(info, ts)
              val sampleCols: Seq[Any] = info.samples match {
                case Some(st) =>
                  val j = st.sampleAt(ts * st.mediaTimescale / 1000L)
                  Seq[Any](j, st.startTicks(j) * 1000L / st.mediaTimescale,
                    st.offsets(j), st.sizes(j),
                    probeByte(bytes, st.offsets(j)))
                case None => Seq[Any](null, null, null, null, null)
              }
              Row.fromSeq(r.toSeq ++
                Seq[Any](i, ts, off, probeByte(bytes, off)) ++ sampleCols)
            }
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  /** Per-payload container metadata as flat columns (null row fields for
    * unparseable payloads) — the video analog of [[Multimodal.decodeMeta]].
    */
  def describeVideos(df: DataFrame,
                     payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("video_mime", StringType),
      StructField("video_width", IntegerType),
      StructField("video_height", IntegerType),
      StructField("video_duration_ms", LongType),
      StructField("video_data_bytes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        VideoMeta.decode(bytes) match {
          case Some(i) => Row.fromSeq(r.toSeq ++
            Seq(i.mime, i.width, i.height, i.durationMs, i.dataSize))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }
}
