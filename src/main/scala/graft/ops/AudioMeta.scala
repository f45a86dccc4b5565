package graft.ops

/** Pure-JVM audio header decoding — the audio sibling of [[ImageMeta]]: no
  * codec libraries, just byte parsing of the WAV (RIFF) container, so the
  * multimodal audio metadata is REAL (channels, sample rate, duration come
  * from the payload bytes, not the caller's claim).
  *
  * Layout parsed: "RIFF" + size + "WAVE", then a chunk walk for "fmt "
  * (audio format, channels, sample rate, byte rate, block align, bits per
  * sample) and "data" (payload size). Sample-level decode stays out of
  * scope exactly like pixel decode ([[Multimodal.stubDecode]]).
  */
object AudioMeta {

  final case class Info(mime: String, channels: Int, sampleRate: Int,
                        bitsPerSample: Int, durationMs: Long)

  @inline private def u8(x: Byte): Int = x & 0xFF

  private def le16(b: Array[Byte], o: Int): Int = u8(b(o)) | (u8(b(o + 1)) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    u8(b(o)).toLong | (u8(b(o + 1)).toLong << 8) |
      (u8(b(o + 2)).toLong << 16) | (u8(b(o + 3)).toLong << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  /** Chunk-walk decode; returns None for malformed/truncated headers. */
  def decode(b: Array[Byte]): Option[Info] = {
    if (!isWav(b)) return None
    var channels = -1; var rate = -1; var bits = -1
    var byteRate = -1L; var dataSize = -1L
    // Long offsets: a corrupted 32-bit chunk size must neither wrap an Int
    // (infinite loop / negative index) nor stall the walk
    var o = 12L
    while (o + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val oi = o.toInt
      val id = tag(b, oi)
      val size = le32(b, oi + 4)
      if (id == "fmt " && o + 24 <= b.length) {
        channels = le16(b, oi + 10)
        rate = le32(b, oi + 12).toInt
        byteRate = le32(b, oi + 16)
        bits = le16(b, oi + 22)
      } else if (id == "data") {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      o += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(Info("audio/wav", channels, rate, bits,
      dataSize * 1000L / byteRate))
  }
}
