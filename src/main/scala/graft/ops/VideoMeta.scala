package graft.ops

/** Pure-JVM video container metadata parsing — the video sibling of
  * [[ImageMeta]]/[[AudioMeta]]. Real byte-level parsers, zero external
  * codec dependencies:
  *
  *   - MP4 / ISO BMFF (ISO 14496-12): generic size+type box walk;
  *     `moov/mvhd` yields timescale+duration, `moov/trak/tkhd` yields the
  *     16.16 fixed-point presentation width/height, and the top-level
  *     `mdat` box's offset/size anchor byte-accurate sample seeks.
  *   - AVI / RIFF: chunk walk to `LIST hdrl → avih` (frame period,
  *     total frames, dimensions) and `LIST movi` (sample data section).
  *
  * Frame PIXEL decode needs an H.264/VP9/… codec that is deliberately out
  * of scope for a JVM-only build — [[Video.sampleFrames]] stubs that one
  * step behind a clearly-marked deterministic byte probe while keeping all
  * Spark-side plumbing (schema, per-partition batching, row explosion,
  * byte-offset seeks) real.
  */
object VideoMeta {

  /** Container-level metadata plus the location of the encoded sample data
    * (`mdat` for MP4, `LIST movi` for AVI) inside the payload — offsets are
    * into the payload byte array, past the box/chunk header.
    */
  final case class VideoInfo(mime: String, width: Int, height: Int,
                             durationMs: Long, timescale: Long,
                             dataOffset: Long, dataSize: Long,
                             samples: Option[SampleTable] = None,
                             framePeriodUs: Long = 0L)

  /** Per-sample index recovered from the MP4 sample tables
    * (`stts`/`stsz`/`stsc`/`stco`): for sample j, `startTicks(j)` is its
    * decode timestamp in MEDIA-timescale ticks (cumulative stts deltas),
    * `offsets(j)` its absolute byte offset in the payload (stco chunk base
    * + intra-chunk size prefix via the stsc chunk map) and `sizes(j)` its
    * byte length. Arrays are per-video and bounded by the video's own
    * sample count — built row-at-a-time inside `mapPartitions`, never
    * collected.
    */
  final case class SampleTable(mediaTimescale: Long, startTicks: Array[Long],
                               offsets: Array[Long], sizes: Array[Long]) {
    def n: Int = sizes.length
    /** Index of the sample being decoded at media-tick `ticks`: the largest
      * j with startTicks(j) <= ticks (clamped into [0, n-1]).
      */
    def sampleAt(ticks: Long): Int = {
      var lo = 0; var hi = n - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (startTicks(mid) <= ticks) lo = mid else hi = mid - 1
      }
      lo
    }
  }

  /** Sanity cap on declared sample/entry counts: a malformed count larger
    * than the payload could ever index must not allocate.
    */
  private val MaxSamples = 1 << 22

  @inline private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  @inline private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  @inline private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 4) == "ftyp"

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourcc(b, 0) == "RIFF" &&
      fourcc(b, 8) == "AVI "

  /** Walk top-level (or container-scoped) ISO BMFF boxes in `[from, to)`,
    * invoking `f(type, contentStart, contentEnd)` per box. Handles the
    * 64-bit `size==1` largesize form; stops on any malformed size.
    */
  private def walkBoxes(b: Array[Byte], from: Long, to: Long)
                       (f: (String, Long, Long) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val size0 = be32(b, o.toInt)
      val typ = fourcc(b, o.toInt + 4)
      var content = o + 8
      val boxEnd =
        if (size0 == 1 && o + 16 <= to) {
          content = o + 16
          o + (be32(b, o.toInt + 8) << 32 | be32(b, o.toInt + 12))
        } else if (size0 == 0) to // box extends to end of enclosing scope
        else o + size0
      if (boxEnd <= o || boxEnd > to) return
      f(typ, content, boxEnd)
      o = boxEnd
    }
  }

  /** Parse one trak's `mdia` subtree into a [[SampleTable]]: `mdhd` gives
    * the media timescale, `minf/stbl` carries the four sample tables. All
    * four (plus a positive timescale) must be present and mutually
    * consistent or the whole table is rejected (None) — a partial table
    * would silently mis-seek.
    */
  private def parseMdia(b: Array[Byte], ds: Long, de: Long): Option[SampleTable] = {
    var mediaTs = 0L
    var sttsRuns: Array[(Long, Long)] = null        // (count, delta)
    var sizes: Array[Long] = null
    var stscRuns: Array[(Long, Long)] = null        // (first_chunk, samples_per_chunk)
    var chunkOffs: Array[Long] = null
    walkBoxes(b, ds, de) {
      case ("mdhd", s, e) if e - s >= 20 =>
        val version = b(s.toInt) & 0xFF
        if (version == 1) { if (e - s >= 32) mediaTs = be32(b, s.toInt + 20) }
        else mediaTs = be32(b, s.toInt + 12)
      case ("minf", fs, fe) =>
        walkBoxes(b, fs, fe) {
          case ("stbl", ss, se) =>
            walkBoxes(b, ss, se) {
              case ("stts", s, e) if e - s >= 8 =>
                val n = be32(b, s.toInt + 4)
                if (n <= MaxSamples && s + 8 + 8 * n <= e)
                  sttsRuns = Array.tabulate(n.toInt) { i =>
                    val o = s.toInt + 8 + 8 * i
                    (be32(b, o), be32(b, o + 4))
                  }
              case ("stsz", s, e) if e - s >= 12 =>
                val fixed = be32(b, s.toInt + 4)
                val n = be32(b, s.toInt + 8)
                if (n <= MaxSamples) {
                  // fixed-size form has no entry list to bound n, so bound
                  // it by the payload instead: n samples of `fixed` bytes
                  // can't exceed the container (a 200-byte forgery must
                  // not drive three 4M-element allocations)
                  if (fixed > 0) {
                    if (n * fixed <= b.length) sizes = Array.fill(n.toInt)(fixed)
                  } else if (s + 12 + 4 * n <= e)
                    sizes = Array.tabulate(n.toInt)(i => be32(b, s.toInt + 12 + 4 * i))
                }
              case ("stsc", s, e) if e - s >= 8 =>
                val n = be32(b, s.toInt + 4)
                if (n <= MaxSamples && s + 8 + 12 * n <= e)
                  stscRuns = Array.tabulate(n.toInt) { i =>
                    val o = s.toInt + 8 + 12 * i
                    (be32(b, o), be32(b, o + 4))
                  }
              case ("stco", s, e) if e - s >= 8 =>
                val n = be32(b, s.toInt + 4)
                if (n <= MaxSamples && s + 8 + 4 * n <= e)
                  chunkOffs = Array.tabulate(n.toInt)(i => be32(b, s.toInt + 8 + 4 * i))
              case ("co64", s, e) if e - s >= 8 =>
                val n = be32(b, s.toInt + 4)
                if (n <= MaxSamples && s + 8 + 8 * n <= e)
                  chunkOffs = Array.tabulate(n.toInt) { i =>
                    val o = s.toInt + 8 + 8 * i
                    be32(b, o) << 32 | be32(b, o + 4)
                  }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (mediaTs <= 0 || sttsRuns == null || sizes == null ||
        stscRuns == null || chunkOffs == null || sizes.length == 0) return None
    val n = sizes.length
    // decode-start ticks: expand the stts (count, delta) runs
    if (sttsRuns.map(_._1).sum != n) return None
    val starts = new Array[Long](n)
    var j = 0; var t = 0L
    sttsRuns.foreach { case (cnt, delta) =>
      var c = 0L
      while (c < cnt && j < n) { starts(j) = t; t += delta; j += 1; c += 1 }
    }
    // byte offsets: walk chunks, resolving samples-per-chunk from the last
    // stsc run whose first_chunk <= the current (1-based) chunk index.
    // Runs must start at chunk 1 and strictly increase — a run table that
    // skips chunk 1 (or doubles back) has no defined mapping, and applying
    // run 0 anyway would be exactly the silent mis-seek this rejection
    // policy exists to prevent.
    if (stscRuns.isEmpty || stscRuns.head._1 != 1L ||
        stscRuns.iterator.sliding(2).withPartial(false)
          .exists(p => p(1)._1 <= p(0)._1) ||
        chunkOffs.length == 0) return None
    val offsets = new Array[Long](n)
    var sample = 0; var run = 0
    var chunk = 1
    while (sample < n && chunk <= chunkOffs.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
      val perChunk = stscRuns(run)._2
      if (perChunk <= 0) return None
      var within = 0L; var off = chunkOffs(chunk - 1)
      while (within < perChunk && sample < n) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1; within += 1
      }
      chunk += 1
    }
    if (sample < n) return None // ran out of chunks before samples
    Some(SampleTable(mediaTs, starts, offsets, sizes))
  }

  private def decodeMp4(b: Array[Byte]): Option[VideoInfo] = {
    var timescale = 0L; var duration = 0L
    var width = 0; var height = 0
    var mdatOff = 0L; var mdatSize = 0L
    var samples: Option[SampleTable] = None
    walkBoxes(b, 0L, b.length.toLong) {
      case ("mdat", s, e) =>
        if (mdatSize == 0) { mdatOff = s; mdatSize = e - s }
      case ("moov", ms, me) =>
        walkBoxes(b, ms, me) {
          case ("mvhd", s, e) if e - s >= 20 =>
            val version = b(s.toInt) & 0xFF
            if (version == 1) {
              // v1: creation/modification are 64-bit; duration is 64-bit
              // (reads through s+32 — a shorter v1 box is malformed and
              // must NOT fall through to the v0 offsets, which would read
              // creation-time bytes as the timescale)
              if (e - s >= 32) {
                timescale = be32(b, s.toInt + 20)
                duration = be32(b, s.toInt + 24) << 32 | be32(b, s.toInt + 28)
              }
            } else {
              timescale = be32(b, s.toInt + 12)
              duration = be32(b, s.toInt + 16)
            }
          case ("trak", ts, te) =>
            walkBoxes(b, ts, te) {
              case ("tkhd", s, e) if e - s >= 84 =>
                val version = b(s.toInt) & 0xFF
                // width/height are 16.16 fixed point at the end of the box;
                // v1 adds 12 bytes of 64-bit times before the matrix
                val base = if (version == 1) s + 88 else s + 76
                if (base + 8 <= e) {
                  width = (be32(b, base.toInt) >> 16).toInt
                  height = (be32(b, base.toInt + 4) >> 16).toInt
                }
              case ("mdia", ds, de) =>
                // first trak with a complete sample table wins (the video
                // track leads in every mainstream muxer's box order)
                if (samples.isEmpty) samples = parseMdia(b, ds, de)
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (timescale <= 0) None
    else Some(VideoInfo("video/mp4", width, height,
      duration * 1000L / timescale, timescale, mdatOff, mdatSize, samples))
  }

  private def decodeAvi(b: Array[Byte]): Option[VideoInfo] = {
    var usPerFrame = 0L; var totalFrames = 0L
    var width = 0; var height = 0
    var moviOff = 0L; var moviSize = 0L
    var o = 12L
    val end = math.min(b.length.toLong, 8L + le32(b, 4))
    while (o + 8 <= end) {
      val id = fourcc(b, o.toInt)
      val size = le32(b, o.toInt + 4)
      val content = o + 8
      if (content + size > end) return None
      if (id == "LIST" && size >= 4) {
        val listType = fourcc(b, content.toInt)
        if (listType == "movi") { moviOff = content + 4; moviSize = size - 4 }
        else if (listType == "hdrl") {
          var ho = content + 4
          val hend = content + size
          while (ho + 8 <= hend) {
            val hid = fourcc(b, ho.toInt)
            val hsize = le32(b, ho.toInt + 4)
            // the avih reads reach ho+48: trust the LIST bound, not just
            // the chunk's self-declared size (truncated hdrl payloads)
            if (hid == "avih" && hsize >= 40 && ho + 48 <= hend) {
              usPerFrame = le32(b, ho.toInt + 8)
              totalFrames = le32(b, ho.toInt + 24)
              width = le32(b, ho.toInt + 40).toInt
              height = le32(b, ho.toInt + 44).toInt
            }
            ho += 8 + hsize + (hsize & 1) // chunks are word-aligned
          }
        }
      }
      o = content + size + (size & 1)
    }
    if (usPerFrame <= 0) None
    else Some(VideoInfo("video/x-msvideo", width, height,
      totalFrames * usPerFrame / 1000L, 1000000L / math.max(1L, usPerFrame),
      moviOff, moviSize,
      // the exact frame period: `timescale` above is the INTEGER-truncated
      // fps (29.97 → 29, sub-1fps → 0), fine as a nominal rate but wrong
      // as a timestamp base — frame timestamps derive from this instead
      framePeriodUs = usPerFrame))
  }

  /** Dispatch on container magic; None for anything that isn't a
    * recognizable MP4/AVI payload.
    */
  def decode(b: Array[Byte]): Option[VideoInfo] =
    if (isMp4(b)) decodeMp4(b)
    else if (isAvi(b)) decodeAvi(b)
    else None

  /** Byte ranges `(offset, size)` of the encoded video frames inside an
    * AVI payload, in stream order: walks the `LIST movi` chunk sequence
    * (located by [[decode]]), collecting `##dc`/`##db` video chunks and
    * recursing into `LIST rec ` interleave groups (AVI 1.0 groups chunks
    * meant to be read together under `rec ` lists — OpenDML §2). Audio
    * (`##wb`), index and unknown chunks are skipped by their declared
    * size; chunk headers that would overrun the movi bound end the walk
    * (truncated payload) rather than throw. Empty for non-AVI payloads.
    *
    * Reference behavior: woodwork has no media surface; this backs the
    * engine's multimodal pipeline ops (SURVEY §2.12).
    */
  def aviFrameRanges(b: Array[Byte]): Array[(Long, Long)] =
    aviFrameRanges(b, decode(b))

  /** [[aviFrameRanges]] against an ALREADY-decoded [[VideoInfo]] — callers
    * that need both the metadata and the ranges (e.g.
    * [[Video.decodeMjpegFrames]]) parse the container header once, not
    * twice per payload.
    */
  def aviFrameRanges(b: Array[Byte],
                     info: Option[VideoInfo]): Array[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    def walk(from: Long, to: Long): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = fourcc(b, o.toInt)
        val size = le32(b, o.toInt + 4)
        val content = o + 8
        if (content + size > to) return // truncated chunk: stop cleanly
        if (id == "LIST" && size >= 4 &&
            fourcc(b, content.toInt) == "rec ")
          walk(content + 4, content + size)
        else if (isVideoChunk(id)) out += ((content, size))
        o = content + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    info match {
      case Some(i) if i.mime == "video/x-msvideo" && i.dataSize > 0 =>
        walk(i.dataOffset, math.min(b.length.toLong,
          i.dataOffset + i.dataSize))
      case _ =>
    }
    out.toArray
  }
}
