package graft

import graft.ops.{Multimodal, Video, VideoMeta}
import org.apache.spark.sql.functions._

/** Image resize (integer box filter) and video container parsing /
  * frame-sampling plumbing.
  */
class VideoResizeSpec extends SparkSpec {

  // ------------------------------------------------------------- image resize

  test("thumbDims: aspect-preserving integer floor arithmetic") {
    assert(Multimodal.thumbDims(24, 12, 12) == (12, 6))   // 2:1 downscale
    assert(Multimodal.thumbDims(8, 8, 12) == (12, 12))    // upscale square
    assert(Multimodal.thumbDims(23, 9, 12) == (12, 4))    // 23*12/23, 9*12/23
    assert(Multimodal.thumbDims(1000, 1, 12) == (12, 1))  // extreme aspect
    assert(Multimodal.thumbDims(1, 1000, 12) == (1, 12))
  }

  /** Brute-force reference of the pinned box-filter semantics. */
  private def refResize(src: Array[Array[Int]], dw: Int, dh: Int): Array[Array[Int]] = {
    val sh = src.length; val sw = src(0).length
    Array.tabulate(dh, dw) { (y, x) =>
      val x0 = x * sw / dw; val x1 = math.max(x0 + 1, (x + 1) * sw / dw)
      val y0 = y * sh / dh; val y1 = math.max(y0 + 1, (y + 1) * sh / dh)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (sy <- y0 until y1; sx <- x0 until x1) {
        val p = src(sy)(sx)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      }
      val n = (x1 - x0).toLong * (y1 - y0)
      (((sr / n).toInt) << 16) | (((sg / n).toInt) << 8) | (sb / n).toInt
    }
  }

  test("resizePixels matches the brute-force box-filter reference") {
    val rnd = new scala.util.Random(7)
    for ((sw, sh, dw, dh) <- Seq((10, 7, 4, 3), (5, 5, 12, 12), (16, 4, 8, 2),
                                 (9, 13, 3, 5))) {
      val src = Array.fill(sh, sw)(rnd.nextInt(1 << 24))
      val img = new java.awt.image.BufferedImage(
        sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until sh; x <- 0 until sw) img.setRGB(x, y, src(y)(x))
      val out = Multimodal.resizePixels(img, dw, dh)
      val ref = refResize(src, dw, dh)
      assert(out.getWidth == dw && out.getHeight == dh)
      for (y <- 0 until dh; x <- 0 until dw)
        assert((out.getRGB(x, y) & 0xFFFFFF) == ref(y)(x),
          s"pixel ($x,$y) of ${sw}x$sh -> ${dw}x$dh")
    }
  }

  test("resizeImages: PNG decode -> resize -> re-encode round trip on a DataFrame") {
    import spark.implicits._
    val mkPng = udf { (k: Long) =>
      val img = new java.awt.image.BufferedImage(
        20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 20)
        img.setRGB(x, y, (((x * 12) % 256) << 16) | (((y * 25) % 256) << 8) | k.toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(1L, 2L).toDF("id").withColumn("img", mkPng(col("id")))
    val withP = Multimodal.withPayload(df, "img", "image", "image/png")
    val out = Multimodal.resizeImages(withP, maxSide = 8).collect()
    assert(out.length == 2)
    for (r <- out) {
      val bytes = r.getAs[Array[Byte]]("payload_resized")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 8 && img.getHeight == 4) // 20x10 under max side 8
    }
    // undecodable payload passes through as null, row preserved
    val junk = Seq(("x", "not an image".getBytes)).toDF("id", "payload")
    val jr = Multimodal.resizeImages(junk, 8).collect()
    assert(jr.length == 1 && jr(0).isNullAt(jr(0).fieldIndex("payload_resized")))
  }

  private def pngOf(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: brightness-shift invariant, scale-robust, junk refuses") {
    def tex(x: Int, y: Int) = {
      val v = (x * x * 7 + y * 13) % 200
      (v << 16) | (((v * 3) % 200) << 8) | ((x * y) % 200)
    }
    val base = Multimodal.dHash(pngOf(32, 24, tex)).get
    // uniform +20 on every channel: every comparison unchanged
    val brighter = Multimodal.dHash(pngOf(32, 24, (x, y) => {
      val p = tex(x, y)
      (((p >> 16) + 20) << 16) | ((((p >> 8) & 0xFF) + 20) << 8) | ((p & 0xFF) + 20)
    })).get
    assert(base == brighter)
    // 2x upscale (pixel replication): identical box-averaged grid
    val scaled = Multimodal.dHash(pngOf(64, 48, (x, y) => tex(x / 2, y / 2))).get
    assert(base == scaled)
    assert(Multimodal.dHash("not an image".getBytes) == None)
    assert((base >> Multimodal.DHashBits) == 0L, "56-bit hash stays non-negative")
  }

  test("imageNearDups equals the exhaustive Hamming join (pigeonhole recall)") {
    import spark.implicits._
    // 8 base textures + 8 lightly perturbed variants (k >= 8 reuses k-8's
    // texture with a sparse +4 luma bump)
    def variant(k: Long)(x: Int, y: Int): Int =
      ((((x * x + y * 3 + (k % 8).toInt * 37) % 200) +
        (if (k >= 8 && (x + y) % 9 == 0) 4 else 0)) * 0x010101)
    val mk = udf { (k: Long) => pngOf(20, 16, variant(k)) }
    val dfv = (0L until 16L).toDF("id")
      .withColumn("payload", mk(col("id")))
    val got = Multimodal.imageNearDups(dfv, "id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exhaustive reference over driver-computed hashes
    val hashes = (0L until 16L).map { k =>
      k -> Multimodal.dHash(pngOf(20, 16, variant(k))).get
    }.toMap
    val want = (for {
      a <- 0L until 16L; b <- (a + 1) until 16L
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must produce at least one near-dup pair")
  }

  private def wavOf(samples: Array[Short], channels: Int = 1,
                    rate: Int = 8000): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ba = channels * 2
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * ba).putShort(ba.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("audioHash: level-scale invariant, short/junk refuses, near-dup parity") {
    val s = Array.tabulate(200)(i => (((i * 37 + 11) % 3001) - 1500).toShort)
    val base = Multimodal.audioHash(wavOf(s)).get
    // doubling every sample scales every window loudness uniformly
    val louder = Multimodal.audioHash(
      wavOf(s.map(v => (v * 2).toShort))).get
    assert(base == louder)
    assert((base >> Multimodal.DHashBits) == 0L)
    assert(Multimodal.audioHash(wavOf(s.take(56))) == None) // < 57 samples
    assert(Multimodal.audioHash("junk".getBytes) == None)

    import spark.implicits._
    def sampleOf(k: Long): Array[Short] = Array.tabulate(150)(i =>
      ((((i * ((k % 5) + 3) * 41 + 7) % 2801) - 1400 +
        (if (k >= 5 && i % 11 == 0) 6 else 0))).toShort)
    val mk = udf { (k: Long) => wavOf(sampleOf(k)) }
    val df = (0L until 10L).toDF("id").withColumn("payload", mk(col("id")))
    val got = Multimodal.audioNearDups(df, "id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = (0L until 10L)
      .map(k => k -> Multimodal.audioHash(wavOf(sampleOf(k))).get).toMap
    val want = (for {
      a <- 0L until 10L; b <- (a + 1) until 10L
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  // ------------------------------------------------------------ video parsing

  import VideoFixtures.{mkMp4, mkAvi}

  test("VideoMeta: MP4 mvhd/tkhd/mdat fields recovered from real boxes") {
    val data = Array.tabulate(100)(i => (i % 251).toByte)
    val mp4 = mkMp4(timescale = 600, durTicks = 3000, w = 320, h = 240, data)
    val info = VideoMeta.decode(mp4).get
    assert(info.mime == "video/mp4")
    assert(info.durationMs == 5000) // 3000 ticks / 600 per sec
    assert(info.width == 320 && info.height == 240)
    assert(info.dataOffset == 248 && info.dataSize == 100)
    // truncated and junk payloads refuse cleanly
    assert(VideoMeta.decode(mp4.take(30)).isEmpty)
    assert(VideoMeta.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(VideoMeta.decode(Array.empty[Byte]).isEmpty)
  }

  test("VideoMeta: AVI avih/movi fields recovered from RIFF chunks") {
    val movi = Array.fill[Byte](40)(9)
    val avi = mkAvi(usPerFrame = 40000, totalFrames = 250, w = 640, h = 480, movi)
    val info = VideoMeta.decode(avi).get
    assert(info.mime == "video/x-msvideo")
    assert(info.durationMs == 10000) // 250 frames at 25 fps
    assert(info.width == 640 && info.height == 480)
    assert(info.dataSize == 40)
    assert(new String(avi, info.dataOffset.toInt - 4, 4, "ISO-8859-1") == "movi")
  }

  test("sampleFrames: 1-to-n explosion, midpoint timestamps, proportional seeks") {
    import spark.implicits._
    val data = Array.tabulate(200)(i => ((i * 3) % 256).toByte)
    val mp4 = mkMp4(600, 6000, 160, 80, data) // 10 000 ms
    val df = Seq((1L, mp4), (2L, "junk".getBytes)).toDF("id", "payload")
    val frames = Video.sampleFrames(df, n = 4).collect().sortBy(_.getInt(2))
    assert(frames.length == 4) // junk row yields zero frames
    assert(frames.map(_.getLong(3)).toSeq == Seq(1250L, 3750L, 6250L, 8750L))
    for (r <- frames) {
      val ts = r.getLong(3)
      val off = 248 + math.min(199L, ts * 200 / 10000)
      assert(r.getLong(4) == off)
      assert(r.getInt(5) == (mp4(off.toInt) & 0xFF))
    }
    val meta = Video.describeVideos(df).collect().sortBy(_.getLong(0))
    assert(meta(0).getAs[Long]("video_duration_ms") == 10000L)
    assert(meta(1).isNullAt(meta(1).fieldIndex("video_mime")))
  }

  // ------------------------------------------------- MP4 sample-table parsing

  import VideoFixtures.mkMp4Indexed

  /** 5 samples: stts runs (2×100, 3×150) ticks at mts=1000; sizes
    * 30/40/20/50/25 split 3+2 across two chunks with a 5-byte gap.
    * Expected decode starts [0,100,200,350,500], offsets
    * [440,470,510,535,585] (mdat content at 420+4·5=440).
    */
  private def indexedMp4(durTicks: Int = 390) =
    mkMp4Indexed(timescale = 600, durTicks = durTicks, w = 160, h = 80,
      mts = 1000, n1 = 2, delta1 = 100, n2 = 3, delta2 = 150,
      sizes = Seq(30, 40, 20, 50, 25), c1 = 3, gap = 5,
      fill = i => 3 * i + 7)

  test("VideoMeta: stts/stsz/stsc/stco recovered into a per-sample index") {
    val info = VideoMeta.decode(indexedMp4()).get
    val st = info.samples.get
    assert(st.mediaTimescale == 1000L)
    assert(st.startTicks.toSeq == Seq(0L, 100L, 200L, 350L, 500L))
    assert(st.sizes.toSeq == Seq(30L, 40L, 20L, 50L, 25L))
    // chunk 1 is contiguous from the mdat content start; chunk 2 skips the
    // 5-byte interleave gap declared only through its stco offset
    assert(st.offsets.toSeq == Seq(440L, 470L, 510L, 535L, 585L))
    // timestamp → sample binary search, including exact boundaries + clamp
    assert(st.sampleAt(0) == 0 && st.sampleAt(99) == 0)
    assert(st.sampleAt(100) == 1 && st.sampleAt(349) == 2)
    assert(st.sampleAt(350) == 3 && st.sampleAt(500) == 4)
    assert(st.sampleAt(100000) == 4) // past media duration → last sample
  }

  test("VideoMeta: co64 offsets and constant-size stsz parse identically") {
    // same logical table as indexedMp4 but constant 30-byte samples
    // written as a fixed-size stsz (no entry list) + 64-bit co64 offsets;
    // layout shifts (-4n stsz bytes, +8 co64 bytes) move the mdat start,
    // which the parser must pick up from the boxes, not a constant
    val b = mkMp4Indexed(timescale = 600, durTicks = 390, w = 160, h = 80,
      mts = 1000, n1 = 2, delta1 = 100, n2 = 3, delta2 = 150,
      sizes = Seq(30, 30, 30, 30, 30), c1 = 3, gap = 5,
      fill = i => 3 * i + 7, fixedSize = 30, co64 = true)
    val st = VideoMeta.decode(b).get.samples.get
    // default S = 420 + 4n; dropping the n stsz entries subtracts 4n and
    // co64 adds 8 → 420 + 8 = 428, independent of n
    val sOff = 428
    assert(st.sizes.toSeq == Seq.fill(5)(30L))
    assert(st.startTicks.toSeq == Seq(0L, 100L, 200L, 350L, 500L))
    assert(st.offsets.toSeq == Seq(sOff, sOff + 30, sOff + 60,
      sOff + 95, sOff + 125).map(_.toLong))
  }

  test("VideoMeta: incomplete sample tables are rejected whole") {
    val full = indexedMp4()
    // corrupt the stco tag: the table set is incomplete → samples = None,
    // container-level metadata still parses
    val idx = full.indexOfSlice("stco".getBytes("ISO-8859-1"))
    assert(idx > 0)
    val broken = full.clone()
    "free".getBytes("ISO-8859-1").copyToArray(broken, idx)
    val info = VideoMeta.decode(broken).get
    assert(info.samples.isEmpty)
    assert(info.width == 160 && info.durationMs == 650L)

    // a stsc run table that skips chunk 1 has no defined chunk mapping:
    // reject rather than silently applying the first run to chunk 1
    val badStsc = full.clone()
    val sIdx = full.indexOfSlice("stsc".getBytes("ISO-8859-1"))
    // layout after the tag: verflags(4) entry_count(4) first_chunk(4) —
    // the LSB of run 1's first_chunk is tag+11 relative to content, i.e.
    // sIdx+4(rest of tag)... concretely: sIdx is the tag start, content
    // starts at sIdx+4, so first_chunk occupies sIdx+12..15
    badStsc(sIdx + 15) = 2 // first run's first_chunk: 1 → 2
    assert(VideoMeta.decode(badStsc).get.samples.isEmpty)
  }

  test("sampleFrames: frame-accurate sample mapping from the tables") {
    import spark.implicits._
    // movie duration 390 ticks @600 = 650 ms = media duration: frame
    // midpoints 81/243/406/568 ms land in samples 0/2/3/4
    val df = Seq((1L, indexedMp4())).toDF("id", "payload")
    val fr = Video.sampleFrames(df, n = 4).collect().sortBy(_.getInt(2))
    assert(fr.map(_.getLong(3)).toSeq == Seq(81L, 243L, 406L, 568L))
    assert(fr.map(_.getInt(6)).toSeq == Seq(0, 2, 3, 4))        // sample_idx
    assert(fr.map(_.getLong(7)).toSeq == Seq(0L, 200L, 350L, 500L)) // ts_ms
    assert(fr.map(_.getLong(8)).toSeq == Seq(440L, 510L, 535L, 585L)) // offset
    assert(fr.map(_.getLong(9)).toSeq == Seq(30L, 20L, 50L, 25L))   // size
    // sample_byte probes the true sample start: fill(off - 440)
    assert(fr.map(_.getInt(10)).toSeq ==
      Seq(7, (3 * 70 + 7) % 256, (3 * 95 + 7) % 256, (3 * 145 + 7) % 256))
  }

  test("sampleFrames: movie timeline past media duration clamps to last sample") {
    import spark.implicits._
    // movie 1200 ticks @600 = 2000 ms but media ends at 650 ms: frames at
    // 250/750/1250/1750 ms map to samples 2/4/4/4
    val df = Seq((1L, indexedMp4(durTicks = 1200))).toDF("id", "payload")
    val fr = Video.sampleFrames(df, n = 4).collect().sortBy(_.getInt(2))
    assert(fr.map(_.getInt(6)).toSeq == Seq(2, 4, 4, 4))
  }

  test("sampleFrames: table-less containers emit null sample columns") {
    import spark.implicits._
    val mp4 = mkMp4(600, 6000, 160, 80, Array.fill[Byte](50)(1)) // no stbl
    val avi = mkAvi(40000, 250, 640, 480, Array.fill[Byte](40)(9))
    val df = Seq((1L, mp4), (2L, avi)).toDF("id", "payload")
    val fr = Video.sampleFrames(df, n = 2).collect()
    assert(fr.length == 4)
    for (r <- fr; c <- 6 to 10) assert(r.isNullAt(c))
    // the proportional probe path still fills
    for (r <- fr) assert(r.getLong(4) > 0 && r.getInt(5) >= 0)
  }
}
