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
                             dataOffset: Long, dataSize: Long)

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

  private def decodeMp4(b: Array[Byte]): Option[VideoInfo] = {
    var timescale = 0L; var duration = 0L
    var width = 0; var height = 0
    var mdatOff = 0L; var mdatSize = 0L
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
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (timescale <= 0) None
    else Some(VideoInfo("video/mp4", width, height,
      duration * 1000L / timescale, timescale, mdatOff, mdatSize))
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
      moviOff, moviSize))
  }

  /** Dispatch on container magic; None for anything that isn't a
    * recognizable MP4/AVI payload.
    */
  def decode(b: Array[Byte]): Option[VideoInfo] =
    if (isMp4(b)) decodeMp4(b)
    else if (isAvi(b)) decodeAvi(b)
    else None
}
