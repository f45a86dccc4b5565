package graft

import graft.ops.{Video, VideoMeta}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real MJPEG pixel decode: AVI frame-chunk walk → per-frame JPEG →
  * `javax.imageio` → BT.601 luma statistics ([[Video.decodeMjpegFrames]]).
  * Block-constant grayscale frames round-trip the JPEG codec exactly, so
  * most assertions here are EXACT; the RGB path (YCbCr conversion +
  * chroma subsampling) is tolerance-checked.
  */
class MjpegDecodeSpec extends SparkSpec {
  import VideoFixtures._

  private def payloadDf(id: Long, payload: Array[Byte]) =
    spark.createDataFrame(
      java.util.List.of(Row(id, payload)),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true))))

  test("gray block-constant frames decode to exact luma stats and timestamps") {
    val f0 = grayBlockJpeg(Array(Array(10, 250), Array(0, 128)))   // 16×16
    val f1 = grayBlockJpeg(Array(Array(200, 200), Array(200, 200)))
    val avi = mkAvi(40000, 2, 16, 16, moviChunks(Seq(f0, f1)))
    val rows = Video.decodeMjpegFrames(payloadDf(7L, avi))
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[Int]("frame_idx") == 0)
    assert(r0.getAs[Long]("ts_ms") == 0L)
    assert(r0.getAs[Int]("frame_width") == 16)
    assert(r0.getAs[Int]("frame_height") == 16)
    assert(r0.getAs[Double]("luma_mean") == (10 + 250 + 0 + 128) / 4.0)
    assert(r0.getAs[Int]("luma_min") == 0)
    assert(r0.getAs[Int]("luma_max") == 250)
    assert(r0.getAs[Long]("frame_size") == f0.length.toLong)
    val r1 = rows(1)
    assert(r1.getAs[Long]("ts_ms") == 40L)              // 25 fps → 40 ms
    assert(r1.getAs[Double]("luma_mean") == 200.0)
    assert(r1.getAs[Int]("luma_min") == 200)
    assert(r1.getAs[Int]("luma_max") == 200)
    // the second chunk sits right after the first (word-aligned)
    assert(r1.getAs[Long]("frame_offset") ==
      r0.getAs[Long]("frame_offset") + f0.length + (f0.length & 1) + 8)
  }

  test("RGB JPEG frames take the 3-band BT.601 path (tolerance-checked)") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (40 << 16) | (120 << 8) | 200)
    val avi = mkAvi(40000, 1, 16, 16, moviChunks(Seq(jpegBytes(img))))
    val r = Video.decodeMjpegFrames(payloadDf(1L, avi)).collect().head
    // per-mille luma of (40,120,200) = 299·40+587·120+114·200 = 105200
    val expected = 105.2
    assert(math.abs(r.getAs[Double]("luma_mean") - expected) < 2.0)
    assert(math.abs(r.getAs[Int]("luma_min") - 105) <= 2)
    assert(math.abs(r.getAs[Int]("luma_max") - 105) <= 2)
  }

  test("non-JPEG frame chunks keep their row with null decode fields") {
    val junk = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val good = grayBlockJpeg(Array(Array(77)))
    val avi = mkAvi(40000, 2, 8, 8, moviChunks(Seq(junk, good)))
    val rows = Video.decodeMjpegFrames(payloadDf(2L, avi))
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("luma_mean")))
    assert(rows(0).getAs[Long]("frame_size") == 64L)
    assert(rows(1).getAs[Double]("luma_mean") == 77.0)
  }

  test("frames inside LIST rec interleave groups are found in order") {
    val fa = grayBlockJpeg(Array(Array(1)))
    val fb = grayBlockJpeg(Array(Array(2)))
    val fc = grayBlockJpeg(Array(Array(3)))
    // rec(frame a + audio chunk) then bare frame b then rec(frame c)
    val movi = recList(moviChunks(Seq(fa)) ++
        moviChunks(Seq(Array[Byte](9, 9, 9, 9)), id = "01wb")) ++
      moviChunks(Seq(fb)) ++ recList(moviChunks(Seq(fc)))
    val avi = mkAvi(40000, 3, 8, 8, movi)
    val ranges = VideoMeta.aviFrameRanges(avi)
    assert(ranges.length == 3)
    val means = Video.decodeMjpegFrames(payloadDf(3L, avi))
      .orderBy("frame_idx").collect().map(_.getAs[Double]("luma_mean"))
    assert(means.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("non-AVI payloads and truncation never throw, yield zero frames") {
    assert(VideoMeta.aviFrameRanges(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoMeta.aviFrameRanges(
      VideoFixtures.mkMp4(600, 3000, 320, 240, new Array[Byte](50))).isEmpty)
    val avi = mkAvi(40000, 1, 8, 8,
      moviChunks(Seq(grayBlockJpeg(Array(Array(5))))))
    for (cut <- 0 to avi.length)                       // every prefix
      VideoMeta.aviFrameRanges(avi.take(cut))          // must not throw
    val df = payloadDf(4L, null)
    assert(Video.decodeMjpegFrames(df).count() == 0L)
  }

  test("MP4 sample tables drive MJPEG decode: exact ranges across the " +
    "chunk gap, stts-derived timestamps") {
    // three JPEG samples in TWO stco chunks separated by a 13-byte hole,
    // 2-run stts (2×30 ticks then 1×50 at media timescale 1000) — frame
    // bytes are located by the recovered tables, not by proportion
    val f0 = grayBlockJpeg(Array(Array(10, 250), Array(0, 128)))
    val f1 = grayBlockJpeg(Array(Array(200, 200), Array(200, 200)))
    val f2 = grayBlockJpeg(Array(Array(42, 42), Array(42, 42)))
    val frames = Seq(f0, f1, f2)
    val sizes = frames.map(_.length)
    val gap = 13
    val data = frames.take(2).flatten ++ Seq.fill(gap)(0.toByte) ++ f2
    val mp4 = mkMp4Indexed(1000, 110, 16, 16, mts = 1000,
      n1 = 2, delta1 = 30, n2 = 1, delta2 = 50,
      sizes = sizes, c1 = 2, gap = gap, fill = i => data(i))
    val rows = Video.decodeMjpegFrames(payloadDf(9L, mp4))
      .orderBy("frame_idx").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("ts_ms")).toSeq == Seq(0L, 30L, 60L))
    assert(rows.map(_.getAs[Double]("luma_mean")).toSeq ==
      Seq((10 + 250 + 0 + 128) / 4.0, 200.0, 42.0))
    assert(rows.map(_.getAs[Long]("frame_size")).toSeq ==
      sizes.map(_.toLong).toSeq)
    // the third frame sits past the inter-chunk hole
    assert(rows(2).getAs[Long]("frame_offset") ==
      rows(0).getAs[Long]("frame_offset") + sizes(0) + sizes(1) + gap)
  }

  test("MP4 without sample tables yields zero MJPEG rows; non-JPEG samples " +
    "keep their row with null decode fields") {
    // table-less MP4 (mkMp4 writes no stbl): nothing to locate frames with
    val bare = mkMp4(600, 3000, 320, 240, new Array[Byte](64))
    assert(Video.decodeMjpegFrames(payloadDf(5L, bare)).count() == 0L)
    // one JPEG + one junk sample: junk keeps its row, fields null
    val good = grayBlockJpeg(Array(Array(77)))
    val junk = Array.tabulate[Byte](48)(i => (i * 5).toByte)
    val data = good ++ junk
    val mp4 = mkMp4Indexed(1000, 80, 8, 8, mts = 1000,
      n1 = 1, delta1 = 40, n2 = 1, delta2 = 40,
      sizes = Seq(good.length, junk.length), c1 = 2, gap = 0,
      fill = i => data(i))
    val rows = Video.decodeMjpegFrames(payloadDf(6L, mp4))
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("luma_mean") == 77.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("luma_mean")))
    assert(rows(1).getAs[Long]("frame_size") == junk.length.toLong)
  }

  test("AVI timestamps come from the exact frame period, not the " +
    "integer-truncated fps") {
    val f = grayBlockJpeg(Array(Array(50)))
    // 29.97 fps: 33367 µs/frame — truncated fps (29) would stamp frame 3
    // at 103 ms; the exact period stamps it at 100 ms
    val ntsc = mkAvi(33367, 4, 8, 8, moviChunks(Seq(f, f, f, f)))
    val ts = Video.decodeMjpegFrames(payloadDf(8L, ntsc))
      .orderBy("frame_idx").collect().map(_.getAs[Long]("ts_ms"))
    assert(ts.toSeq == Seq(0L, 33L, 66L, 100L))
    // sub-1fps (one frame per 2 s): truncated fps would collapse to 1 fps
    val slow = mkAvi(2000000, 2, 8, 8, moviChunks(Seq(f, f)))
    val ts2 = Video.decodeMjpegFrames(payloadDf(9L, slow))
      .orderBy("frame_idx").collect().map(_.getAs[Long]("ts_ms"))
    assert(ts2.toSeq == Seq(0L, 2000L))
  }

  test("q146 fixture parity: the query's formula decodes to the oracle's") {
    // replicate one doc of the q146 fixture through the public operator
    val k = 11L
    val frames = (0 until 3).map { f =>
      grayBlockJpeg(Array.tabulate(2, 4)((by, bx) =>
        ((7 * k + 13 * f + 29 * (by * 4 + bx)) % 256).toInt))
    }
    val avi = mkAvi(40000, 3, 32, 16, moviChunks(frames))
    val rows = Video.decodeMjpegFrames(payloadDf(k, avi))
      .orderBy("frame_idx").collect()
    for ((r, f) <- rows.zipWithIndex) {
      val vals = (0 until 8).map(bi => (7 * k + 13 * f + 29 * bi) % 256)
      assert(r.getAs[Double]("luma_mean") == vals.sum / 8.0)
      assert(r.getAs[Int]("luma_min") == vals.min.toInt)
      assert(r.getAs[Int]("luma_max") == vals.max.toInt)
      assert(r.getAs[Int]("frame_width") == 32)
      assert(r.getAs[Int]("frame_height") == 16)
      assert(r.getAs[Long]("ts_ms") == 40L * f)
    }
  }
}
