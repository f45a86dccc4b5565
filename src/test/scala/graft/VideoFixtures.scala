package graft

/** Shared test builders for minimal video containers (VideoResizeSpec +
  * PropertySpec).
  */
object VideoFixtures {
  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte,
      ((v >>> 16) & 0xFF).toByte, ((v >>> 24) & 0xFF).toByte)
  private def tag(t: String): Array[Byte] = t.getBytes("ISO-8859-1")

  /** Minimal MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)) + mdat. */
  def mkMp4(timescale: Int, durTicks: Int, w: Int, h: Int,
            data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def p(b: Array[Byte]): Unit = bos.write(b)
    p(be32(24)); p(tag("ftyp")); p(tag("isom")); p(be32(0x200))
    p(tag("isom")); p(tag("mp41"))
    p(be32(216)); p(tag("moov"))
    p(be32(108)); p(tag("mvhd")); p(be32(0)); p(be32(0)); p(be32(0))
    p(be32(timescale)); p(be32(durTicks)); p(be32(0x00010000)); p(be32(0x01000000))
    p(be32(0)); p(be32(0))
    p(be32(0x00010000)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x00010000))
    p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x40000000))
    (0 until 6).foreach(_ => p(be32(0))); p(be32(2))
    p(be32(100)); p(tag("trak"))
    p(be32(92)); p(tag("tkhd")); p(be32(7)); p(be32(0)); p(be32(0)); p(be32(1))
    p(be32(0)); p(be32(durTicks)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0))
    p(be32(0x00010000)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x00010000))
    p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x40000000))
    p(be32(w << 16)); p(be32(h << 16))
    p(be32(8 + data.length)); p(tag("mdat")); p(data)
    bos.toByteArray
  }

  /** Minimal AVI: RIFF(AVI ) + LIST hdrl(avih) + LIST movi. */
  def mkAvi(usPerFrame: Int, totalFrames: Int, w: Int, h: Int,
            movi: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def p(b: Array[Byte]): Unit = bos.write(b)
    val hdrlSize = 4 + 8 + 56
    val moviSize = 4 + movi.length
    val total = 4 + 8 + hdrlSize + 8 + moviSize
    p(tag("RIFF")); p(le32(total)); p(tag("AVI "))
    p(tag("LIST")); p(le32(hdrlSize)); p(tag("hdrl"))
    p(tag("avih")); p(le32(56))
    p(le32(usPerFrame)); p(le32(0)); p(le32(0)); p(le32(0))
    p(le32(totalFrames)); p(le32(0)); p(le32(1)); p(le32(0))
    p(le32(w)); p(le32(h))
    (0 until 4).foreach(_ => p(le32(0)))
    p(tag("LIST")); p(le32(moviSize)); p(tag("movi")); p(movi)
    bos.toByteArray
  }
}
