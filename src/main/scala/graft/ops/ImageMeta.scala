package graft.ops

/** Pure-JVM image header decoding — no codec libraries, just byte parsing of
  * the container headers. This makes the multimodal metadata REAL: width,
  * height and mime come from the payload bytes, not the caller's claim.
  *
  *   - PNG: 8-byte signature, IHDR chunk at offset 8 (width/height big-endian
  *     at 16/20).
  *   - JPEG: FFD8 SOI, then marker segments; frame headers SOF0-SOF15 (except
  *     DHT/JPG/DAC) carry height/width big-endian after the precision byte.
  *   - GIF: "GIF87a"/"GIF89a", logical screen width/height little-endian at
  *     offset 6/8.
  *
  * Header parsing here is allocation-free and runs on truncated payloads;
  * full pixel decode lives in [[Multimodal.imageFeatures]] via the JDK's
  * `javax.imageio` readers.
  */
object ImageMeta {

  final case class Info(mime: String, width: Int, height: Int)

  def decode(b: Array[Byte]): Option[Info] =
    if (b == null || b.length < 10) None
    else if (isPng(b)) decodePng(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else if (isGif(b)) decodeGif(b)
    else None

  @inline private def u8(x: Byte): Int = x & 0xFF

  private def be32(b: Array[Byte], o: Int): Long =
    (u8(b(o)).toLong << 24) | (u8(b(o + 1)) << 16) |
      (u8(b(o + 2)) << 8) | u8(b(o + 3))

  private def be16(b: Array[Byte], o: Int): Int =
    (u8(b(o)) << 8) | u8(b(o + 1))

  private def le16(b: Array[Byte], o: Int): Int =
    u8(b(o)) | (u8(b(o + 1)) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && (0 until 8).forall(i => b(i) == PngSig(i))

  private def decodePng(b: Array[Byte]): Option[Info] = {
    // first chunk must be IHDR: length(4) type(4) width(4) height(4) ...
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') None
    else {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(Info("image/png", w.toInt, h.toInt))
    }
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    u8(b(0)) == 0xFF && u8(b(1)) == 0xD8

  /** Scan marker segments for a start-of-frame header. SOF markers are
    * 0xC0-0xCF excluding C4 (DHT), C8 (JPG extension), CC (DAC).
    */
  private def decodeJpeg(b: Array[Byte]): Option[Info] = {
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b(i)) != 0xFF) return None // desynced — not a marker
      // skip fill bytes (padding FFs before a marker)
      var j = i
      while (j + 1 < b.length && u8(b(j + 1)) == 0xFF) j += 1
      if (j + 1 >= b.length) return None
      val marker = u8(b(j + 1))
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
        i = j + 2 // standalone marker, no length field
      } else if (j + 3 < b.length) {
        val len = be16(b, j + 2)
        if (len < 2) return None
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (j + 8 >= b.length) return None
          val h = be16(b, j + 5); val w = be16(b, j + 7)
          return if (w > 0 && h > 0) Some(Info("image/jpeg", w, h)) else None
        }
        i = j + 2 + len
      } else return None
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def decodeGif(b: Array[Byte]): Option[Info] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w > 0 && h > 0) Some(Info("image/gif", w, h)) else None
  }
}
