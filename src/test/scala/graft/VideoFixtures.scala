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

  /** MP4 with a full sample table: ftyp + moov(mvhd + trak(tkhd +
    * mdia(mdhd + minf(stbl(stts/stsz/stsc/stco))))) + mdat — the same
    * layout as the q108 fixture (2-run stts, per-sample stsz, 2-chunk
    * stsc/stco with a `gap`-byte interleave hole). mdat content byte i =
    * `fill(i)`. Content offset of mdat is 420 + 4*sizes.length at the
    * defaults (q108's constant); `fixedSize != 0` writes a constant-size
    * stsz with NO entry list (every element of `sizes` must equal it) and
    * `co64` emits 64-bit chunk offsets — both shift the layout, which the
    * builder recomputes.
    */
  def mkMp4Indexed(timescale: Int, durTicks: Int, w: Int, h: Int,
                   mts: Int, n1: Int, delta1: Int, n2: Int, delta2: Int,
                   sizes: Seq[Int], c1: Int, gap: Int,
                   fill: Int => Int, fixedSize: Int = 0,
                   co64: Boolean = false): Array[Byte] = {
    val n = sizes.length
    require(n1 + n2 == n && c1 >= 1 && c1 <= n)
    require(fixedSize == 0 || sizes.forall(_ == fixedSize))
    val mediaDur = n1 * delta1 + n2 * delta2
    val sumC1 = sizes.take(c1).sum
    val dataLen = sizes.sum + gap
    val stszSize = if (fixedSize != 0) 20 else 20 + 4 * n
    val stcoSize = if (co64) 32 else 24
    val stblSize = 8 + 32 + stszSize + 40 + stcoSize
    val minfSize = 8 + stblSize
    val mdiaSize = 8 + 32 + minfSize
    val trakSize = 8 + 92 + mdiaSize
    val moovSize = 8 + 108 + trakSize
    val sOff = 24 + moovSize + 8
    val bos = new java.io.ByteArrayOutputStream()
    def p(b: Array[Byte]): Unit = bos.write(b)
    p(be32(24)); p(tag("ftyp")); p(tag("isom")); p(be32(0x200))
    p(tag("isom")); p(tag("mp41"))
    p(be32(moovSize)); p(tag("moov"))
    p(be32(108)); p(tag("mvhd")); p(be32(0)); p(be32(0)); p(be32(0))
    p(be32(timescale)); p(be32(durTicks)); p(be32(0x00010000)); p(be32(0x01000000))
    p(be32(0)); p(be32(0))
    p(be32(0x00010000)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x00010000))
    p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x40000000))
    (0 until 6).foreach(_ => p(be32(0))); p(be32(2))
    p(be32(trakSize)); p(tag("trak"))
    p(be32(92)); p(tag("tkhd")); p(be32(7)); p(be32(0)); p(be32(0)); p(be32(1))
    p(be32(0)); p(be32(durTicks)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0))
    p(be32(0x00010000)); p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x00010000))
    p(be32(0)); p(be32(0)); p(be32(0)); p(be32(0x40000000))
    p(be32(w << 16)); p(be32(h << 16))
    p(be32(mdiaSize)); p(tag("mdia"))
    p(be32(32)); p(tag("mdhd")); p(be32(0)); p(be32(0)); p(be32(0))
    p(be32(mts)); p(be32(mediaDur)); p(be32(0x55C40000))
    p(be32(minfSize)); p(tag("minf"))
    p(be32(stblSize)); p(tag("stbl"))
    p(be32(32)); p(tag("stts")); p(be32(0)); p(be32(2))
    p(be32(n1)); p(be32(delta1)); p(be32(n2)); p(be32(delta2))
    p(be32(stszSize)); p(tag("stsz")); p(be32(0)); p(be32(fixedSize)); p(be32(n))
    if (fixedSize == 0) sizes.foreach(s => p(be32(s)))
    p(be32(40)); p(tag("stsc")); p(be32(0)); p(be32(2))
    p(be32(1)); p(be32(c1)); p(be32(1))
    p(be32(2)); p(be32(n - c1)); p(be32(1))
    p(be32(stcoSize)); p(tag(if (co64) "co64" else "stco")); p(be32(0)); p(be32(2))
    if (co64) {
      p(be32(0)); p(be32(sOff))
      p(be32(0)); p(be32(sOff + sumC1 + gap))
    } else {
      p(be32(sOff)); p(be32(sOff + sumC1 + gap))
    }
    p(be32(8 + dataLen)); p(tag("mdat"))
    p(Array.tabulate(dataLen)(i => (fill(i) & 0xFF).toByte))
    bos.toByteArray
  }

  /** movi content from raw frame payloads: each becomes a word-aligned
    * chunk with the given fourcc (default `00dc` = stream-0 compressed
    * video).
    */
  def moviChunks(frames: Seq[Array[Byte]], id: String = "00dc"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      bos.write(tag(id)); bos.write(le32(f.length)); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** A `LIST rec ` interleave group wrapping the given movi-style bytes. */
  def recList(inner: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(tag("LIST")); bos.write(le32(4 + inner.length))
    bos.write(tag("rec ")); bos.write(inner)
    bos.toByteArray
  }

  /** Grayscale JPEG (ImageIO, quality 1.0) whose 8×8 block (bx, by) holds
    * `blocks(by)(bx)` — block-constant gray round-trips the codec exactly
    * (DC-only blocks, unit quantization).
    */
  def grayBlockJpeg(blocks: Array[Array[Int]]): Array[Byte] = {
    val h = blocks.length * 8; val w = blocks(0).length * 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, blocks(y / 8)(x / 8))
    jpegBytes(img)
  }

  /** JPEG-encode any image at explicit quality 1.0. */
  def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    w.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose()
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
