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
  * Frame pixel decode is REAL for Motion-JPEG in AVI
  * ([[decodeMjpegFrames]]: every frame chunk is a standalone JPEG, decoded
  * by `javax.imageio` — true per-frame pixel statistics with zero new
  * dependencies). STUB for inter-frame codecs: H.264/VP9/… need a codec
  * this zero-dependency JVM build deliberately does not ship, so for those
  * [[probeByte]] stands in — a deterministic 1-byte probe at the seek
  * offset. Swapping in a real codec means replacing that single function;
  * every schema/partitioning/explosion contract stays as-is.
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

  private val mjpegFields = Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame_offset", LongType, nullable = false),
    StructField("frame_size", LongType, nullable = false),
    StructField("frame_width", IntegerType, nullable = true),
    StructField("frame_height", IntegerType, nullable = true),
    StructField("luma_mean", DoubleType, nullable = true),
    StructField("luma_min", IntegerType, nullable = true),
    StructField("luma_max", IntegerType, nullable = true))

  /** REAL pixel-level video decode for the one codec a bare JVM ships a
    * decoder for: Motion-JPEG, where every frame is a standalone JPEG
    * image and `javax.imageio` is the codec — in BOTH containers that
    * carry it. AVI: every `##dc` chunk of the `LIST movi` walk
    * ([[VideoMeta.aviFrameRanges]]). MP4 (r12): `jpeg`-coded sample
    * entries carry the same standalone JPEGs, and the recovered sample
    * tables ([[VideoMeta.SampleTable]] from `stts`/`stsz`/`stsc`/`stco`)
    * give each frame's exact byte range and decode timestamp — the
    * composition the AVI path does with the movi walk. This closes the
    * [[probeByte]] stub for MJPEG in either container; inter-frame codecs
    * (H.264/VP9/…) remain the documented out-of-scope boundary.
    *
    * Each payload row explodes into one row per frame, carrying the
    * frame's exact byte range plus, when it decodes as a JPEG, the
    * decoded dimensions and BT.601 luma statistics: per-pixel integer
    * per-mille luma `l = 299R + 587G + 114B` (single-band images:
    * `l = 1000·sample` — same convention as [[Multimodal]]'s feature
    * vectors), reported as `luma_mean = Σl / (1000·npix)` (double) and
    * `luma_min`/`luma_max` as `⌊l/1000⌋` (the 0..255 luma band). `ts_ms`
    * is the frame's display time — AVI: from the container's exact frame
    * period (`frame_idx · µs_per_frame / 1000`, floor — NOT the
    * integer-truncated fps, which would drift ~3% at 29.97 fps and
    * collapse sub-1fps rates); MP4: the sample's decode time from the
    * `stts` table (`startTicks · 1000 / mediaTimescale`, floor — what a
    * real demuxer stamps the frame with). Non-JPEG or undecodable frames
    * keep their row with null decode fields (MJPEG detection is
    * per-frame, by content); payloads that are neither an AVI nor an MP4
    * with complete sample tables yield zero rows.
    *
    * Scale shape: decode runs inside `mapPartitions` — executor-side, one
    * linear pass, no shuffle — so at 100 TB this is a pure map stage whose
    * parallelism is the input partitioning, exactly like
    * [[Multimodal.featurize]].
    */
  def decodeMjpegFrames(df: DataFrame,
                        payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields ++ mjpegFields)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        if (bytes == null) Iterator.empty
        else {
          val decoded = VideoMeta.decode(bytes) // ONE header parse per payload
          // (offset, size, ts_ms) per frame, container-appropriately
          val frames: Array[(Long, Long, Long)] = decoded match {
            case Some(info) if info.mime == "video/x-msvideo" =>
              VideoMeta.aviFrameRanges(bytes, decoded).zipWithIndex.map {
                case ((off, len), i) =>
                  (off, len, i * info.framePeriodUs / 1000L)
              }
            case Some(info) if info.samples.isDefined =>
              val st = info.samples.get
              Array.tabulate(st.n) { i =>
                // split the tick→ms conversion so `ticks * 1000` cannot
                // overflow on forged stts tables (timescale is a uint32, so
                // the remainder term stays ≤ ~4.3e12); same floor result
                val t = st.startTicks(i); val ts = st.mediaTimescale
                (st.offsets(i), st.sizes(i),
                  t / ts * 1000L + t % ts * 1000L / ts)
              }
            case _ => Array.empty
          }
          frames.iterator.zipWithIndex.map { case ((off, len, ts), i) =>
            val dec: Seq[Any] = decodeJpegLuma(bytes, off, len) match {
              case Some((w, h, mean, lo, hi)) => Seq[Any](w, h, mean, lo, hi)
              case None => Seq[Any](null, null, null, null, null)
            }
            Row.fromSeq(r.toSeq ++ Seq[Any](i, ts, off, len) ++ dec)
          }
        }
      }
    }(enc)
  }

  /** Decode one JPEG frame chunk and reduce it to (width, height,
    * luma_mean, luma_min, luma_max) — see [[decodeMjpegFrames]] for the
    * per-mille luma convention. None when the chunk lacks the JPEG SOI
    * magic or `javax.imageio` cannot decode it.
    */
  private def decodeJpegLuma(b: Array[Byte], off: Long,
                             len: Long): Option[(Int, Int, Double, Int, Int)] = {
    // overflow-safe bounds: `off + len` on forged 64-bit sample offsets can
    // wrap negative and slip past a naive `off + len > b.length` guard
    if (len < 4 || off < 0 || len > b.length || off > b.length - len)
      return None
    val o = off.toInt
    if ((b(o) & 0xFF) != 0xFF || (b(o + 1) & 0xFF) != 0xD8) return None
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b, o, len.toInt))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val raster = img.getRaster
    val bands = raster.getNumBands
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l =
          if (bands >= 3)
            299L * raster.getSample(x, y, 0) +
              587L * raster.getSample(x, y, 1) +
              114L * raster.getSample(x, y, 2)
          else 1000L * raster.getSample(x, y, 0)
        sum += l
        if (l < min) min = l
        if (l > max) max = l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, sum.toDouble / (1000.0 * n), (min / 1000L).toInt,
      (max / 1000L).toInt))
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
