package graft.ops

/** Pure-JVM audio header decoding — the audio sibling of [[ImageMeta]]: no
  * codec libraries, just byte parsing of the WAV (RIFF) container, so the
  * multimodal audio metadata is REAL (channels, sample rate, duration come
  * from the payload bytes, not the caller's claim).
  *
  * Layout parsed: "RIFF" + size + "WAVE", then a chunk walk for "fmt "
  * (audio format, channels, sample rate, byte rate, block align, bits per
  * sample) and "data" (payload size). [[pcm16Samples]] decodes the 16-bit
  * PCM payload itself — little-endian byte pairs to signed ints — feeding
  * [[Multimodal]]'s real audio featurization.
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

  /** Parsed fmt chunk plus the data chunk's byte range. */
  final case class Chunks(channels: Int, sampleRate: Int, byteRate: Long,
                          bitsPerSample: Int, dataOffset: Int, dataSize: Long)

  /** Chunk walk; returns None for malformed/truncated headers. */
  def chunks(b: Array[Byte]): Option[Chunks] = {
    if (!isWav(b)) return None
    var channels = -1; var rate = -1; var bits = -1
    var byteRate = -1L; var dataSize = -1L; var dataOff = -1
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
        dataOff = oi + 8
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      o += 8L + size + (size & 1L)
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(Chunks(channels, rate, byteRate, bits, dataOff, dataSize))
  }

  def decode(b: Array[Byte]): Option[Info] =
    chunks(b).map(c => Info("audio/wav", c.channels, c.sampleRate,
      c.bitsPerSample, c.dataSize * 1000L / c.byteRate))

  /** Decoded 16-bit PCM samples (interleaved, all channels pooled) from the
    * data chunk — plain little-endian byte arithmetic, no codec. None when
    * the container isn't 16-bit PCM or the data chunk is truncated.
    */
  def pcm16Samples(b: Array[Byte]): Option[Array[Int]] =
    chunks(b).flatMap { c =>
      if (c.bitsPerSample != 16 || c.dataOffset < 0) None
      else {
        val avail = math.min(c.dataSize, (b.length - c.dataOffset).toLong)
        if (avail < c.dataSize) None // truncated payload
        else {
          val n = (c.dataSize / 2).toInt
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val o = c.dataOffset + 2 * i
            out(i) = (u8(b(o)) | (u8(b(o + 1)) << 8)).toShort.toInt
            i += 1
          }
          Some(out)
        }
      }
    }
}
