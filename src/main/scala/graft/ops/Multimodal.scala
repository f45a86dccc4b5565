package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and decode/featurize steps
  * run as partition-batched transforms (the Scala analog of `mapInPandas` —
  * one iterator per partition, batch-shaped work, no per-row driver calls).
  *
  * Decoding is REAL end-to-end, with zero external dependencies:
  * header metadata via [[ImageMeta]]/[[AudioMeta]] byte parsing, image
  * pixels via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP), and WAV PCM
  * samples via little-endian byte arithmetic over the RIFF data chunk.
  * [[decodeFeatures]] dispatches per payload: decoded-pixel channel
  * statistics for images, decoded-sample amplitude statistics for audio,
  * and exact byte-distribution statistics for anything else. Every feature
  * derives from exact integer sums over decoded values (order-independent,
  * hash-reproducible — see the fixed-point determinism contract used
  * throughout the stats package), converted to double once at the end.
  */
object Multimodal {

  /** Typed metadata carried alongside a binary payload column. */
  val MetaType: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType)))

  val FeatureDim = 8

  /** Attach a multimodal payload: binary column + metadata struct. */
  def withPayload(df: DataFrame, srcCol: String, modality: String,
                  mime: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("payload_meta", struct(
        lit(modality).as("modality"), lit(mime).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(IntegerType).as("channels"),
        lit(null).cast(IntegerType).as("sample_rate")).cast(MetaType))

  // HALF_UP to match SQL round() semantics (half away from zero), the same
  // convention every oracled query in this repo uses
  @inline private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact-integer mean/std pair: mean = Σx/n, std from the exact integer
    * numerator n·Σx² − (Σx)² (no catastrophic cancellation, one double
    * rounding at the end) — mirrored verbatim by the SQL oracles. The
    * numerator multiplies in BigInt: with per-mille luma (l ≤ 255000,
    * l² ≤ 6.5e10) a LONG n·Σl² wraps past 2⁶³ for images beyond roughly
    * 155×155 px, silently corrupting std on ordinary photo sizes.
    */
  @inline private def meanStd(sum: Long, sumSq: Long, n: Long): (Double, Double) = {
    val mean = sum.toDouble / n
    val num = BigInt(n) * BigInt(sumSq) - BigInt(sum) * BigInt(sum)
    (mean, math.sqrt(math.max(
      num.toDouble / (n.toDouble * n.toDouble), 0.0)))
  }

  /** Shared guarded decode: ImageIO parse with the degenerate-dimension
    * check applied uniformly (the four call sites previously each carried
    * their own copy, with drifting guards).
    */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else Some(img)
  }

  /** Pixel-level image features via `javax.imageio` (JDK-native PNG/JPEG/
    * GIF/BMP decode): per-channel mean and population σ over the decoded
    * sRGB values, plus the same pair over BT.601 integer luma (per-mille
    * weights 299/587/114, so sums stay exact). None when the payload isn't
    * a decodable image (e.g. a header-only fixture).
    *
    * Layout: [meanR, meanG, meanB, stdR, stdG, stdB, lumaMean, lumaStd],
    * each rounded to 4 places.
    */
  def imageFeatures(payload: Array[Byte]): Option[Array[Double]] = {
    val img = decodeImage(payload).getOrElse(return None)
    val w = img.getWidth; val h = img.getHeight
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    var qr = 0L; var qg = 0L; var qb = 0L; var ql = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        val l = 299L * r + 587L * g + 114L * b // per-mille BT.601 luma
        sr += r; sg += g; sb += b; sl += l
        qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b; ql += l * l
        x += 1
      }
      y += 1
    }
    val (mr, dr) = meanStd(sr, qr, n); val (mg, dg) = meanStd(sg, qg, n)
    val (mb, db) = meanStd(sb, qb, n); val (ml, dl) = meanStd(sl, ql, n)
    Some(Array(round4(mr), round4(mg), round4(mb),
      round4(dr), round4(dg), round4(db),
      round4(ml / 1000.0), round4(dl / 1000.0)))
  }

  /** Luma histogram of a decoded image: `bins` equal-width buckets over the
    * 0..255 BT.601 luma range (integer per-mille luma, so bucketing is
    * exact integer arithmetic). None when the payload isn't decodable.
    */
  def lumaHistogram(payload: Array[Byte], bins: Int = 8): Option[Array[Long]] = {
    require(bins > 0, s"need bins > 0, got $bins")
    val img = decodeImage(payload).getOrElse(return None)
    val out = new Array[Long](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val l = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF) // 0..255000
        out(math.min((l * bins / 255001L).toInt, bins - 1)) += 1
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Sample-level audio features over decoded 16-bit PCM (all channels
    * pooled): RMS / peak / mean-|s| normalized to full scale, zero-crossing
    * rate, duration, and the container's channel/rate/bit fields. Exact
    * integer sums (Σs² ≤ n·2³⁰ — no overflow below ~2³³ samples), one
    * double conversion at the end. None for non-16-bit or truncated data.
    *
    * Layout: [rms, peak, meanAbs, zcr, durationMs, channels, sampleRate,
    * bitsPerSample], amplitudes in [0,1] rounded to 4 places; duration is
    * EXACT integer milliseconds (dataSize·1000/byteRate in long division —
    * a rounded rational here can land on a decimal tie where binary-exact
    * and shortest-repr rounding disagree across engines).
    */
  def audioFeatures(payload: Array[Byte]): Option[Array[Double]] =
    AudioMeta.chunks(payload).flatMap { c =>
      AudioMeta.pcm16Samples(payload).flatMap { s =>
        if (s.isEmpty) None
        else {
          var sumSq = 0L; var sumAbs = 0L; var peak = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sumSq += v * v; sumAbs += math.abs(v)
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
            i += 1
          }
          val n = s.length
          val rms = math.sqrt(sumSq.toDouble / n) / 32768.0
          val zcr = if (n > 1) zc.toDouble / (n - 1) else 0.0
          Some(Array(round4(rms), round4(peak.toDouble / 32768.0),
            round4(sumAbs.toDouble / n / 32768.0), round4(zcr),
            (c.dataSize * 1000L / c.byteRate).toDouble,
            c.channels.toDouble, c.sampleRate.toDouble,
            c.bitsPerSample.toDouble))
        }
      }
    }

  /** Byte-distribution features for payloads that are neither decodable
    * images nor PCM audio (text blobs, compressed archives, video
    * containers this build doesn't demux): mean/σ of the byte values
    * (exact integer sums), printable-ASCII and whitespace ratios, Shannon
    * entropy in bits from the 256-bin histogram (fixed summation order —
    * deterministic), distinct byte count, and min/max byte.
    */
  def byteFeatures(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Long](256)
    var sum = 0L; var sumSq = 0L
    var printable = 0L; var ws = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      hist(b) += 1; sum += b; sumSq += b.toLong * b
      if (b >= 32 && b < 127) printable += 1
      if (b == ' ' || b == '\t' || b == '\n' || b == '\r') ws += 1
      i += 1
    }
    val n = payload.length.toLong
    val (mean, std) = meanStd(sum, sumSq, n)
    var entropy = 0.0; var distinct = 0L
    var mn = -1; var mx = -1
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        distinct += 1
        if (mn < 0) mn = j
        mx = j
        val p = hist(j).toDouble / n
        entropy -= p * (math.log(p) / math.log(2.0))
      }
      j += 1
    }
    Array(round4(mean), round4(std), round4(printable.toDouble / n),
      round4(ws.toDouble / n), round4(entropy), distinct.toDouble,
      mn.toDouble, mx.toDouble)
  }

  /** Modality-dispatched REAL feature decode: image headers route to
    * `javax.imageio` pixel decode, WAV containers to PCM sample decode,
    * everything else (and any undecodable payload, e.g. a truncated image)
    * to byte-distribution statistics. Always exactly [[FeatureDim]] values.
    */
  def decodeFeatures(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(FeatureDim)(0.0)
    val decoded =
      if (ImageMeta.decode(payload).isDefined) imageFeatures(payload)
      else if (AudioMeta.isWav(payload)) audioFeatures(payload)
      else None
    decoded.getOrElse(byteFeatures(payload))
  }

  /** Partition-batched featurize: the mapPartitions shape keeps decode work
    * executor-side with one setup per partition (ImageIO reader instances
    * are per-thread), mirroring `mapInPandas` batch semantics.
    */
  def featurize(df: DataFrame, payloadCol: String = "payload",
                outCol: String = "features"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decodeFeatures(bytes).toSeq)
      }
    }(enc)
  }

  /** Decode payload headers (image: PNG/JPEG/GIF via [[ImageMeta]]; audio:
    * WAV/RIFF via [[AudioMeta]] — all pure-JVM byte parsing) into the
    * metadata struct: detected mime + true dimensions/channels/rate/duration
    * replace the caller-claimed values; unrecognized payloads pass through
    * untouched. Same mapPartitions shape as [[featurize]] — decode work
    * stays executor-side.
    */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload",
                 metaCol: String = "payload_meta"): DataFrame = {
    val schema = df.schema
    val pIdx = schema.fieldIndex(payloadCol)
    val mIdx = schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(pIdx)) null else r.getAs[Array[Byte]](pIdx)
        ImageMeta.decode(bytes) match {
          case Some(info) =>
            // detected fields replace claims; untouched claims (duration,
            // channels, rate) pass through uniformly
            val old = r.getStruct(mIdx)
            val meta = Row("image", info.mime,
              info.width, info.height,
              if (old == null) null else old.get(4),
              if (old == null) null else old.get(5),
              if (old == null) null else old.get(6))
            Row.fromSeq(r.toSeq.updated(mIdx, meta))
          case None => AudioMeta.decode(bytes) match {
            case Some(a) =>
              val meta = Row("audio", a.mime, null, null,
                a.durationMs, a.channels, a.sampleRate)
              Row.fromSeq(r.toSeq.updated(mIdx, meta))
            case None => r
          }
        }
      }
    }(enc)
  }

  /** Payload-level statistics that need no decoding: byte sizes and content
    * fingerprints, one agg-able projection.
    */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("payload_bytes", length(col(payloadCol)).cast(LongType))
      .withColumn("payload_md5", md5(col(payloadCol)))

  // ------------------------------------------------------------------ resize

  /** Aspect-preserving thumbnail dimensions under a max side length, exact
    * integer floor arithmetic (mirrored by the SQL oracle): with
    * m = max(sw, sh), dw = max(1, sw·T/m), dh = max(1, sh·T/m).
    */
  def thumbDims(sw: Int, sh: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(sw, sh)
    (math.max(1, sw * maxSide / m), math.max(1, sh * maxSide / m))
  }

  /** Deterministic integer box-filter resize of decoded sRGB pixels. The
    * source box for destination pixel (x, y) is
    * `[x·sw/dw, max(x·sw/dw+1, (x+1)·sw/dw)) × [y·sh/dh, max(·+1, ·))`
    * (floor division), i.e. area averaging on downscale degrading to
    * nearest-neighbor on upscale — no empty boxes at any scale pair. Each
    * output channel is the floor of the box mean (exact integer sums). The
    * arithmetic is fully pinned so results are identical on every JVM and
    * reproducible in plain SQL, unlike Graphics2D interpolation.
    */
  def resizePixels(src: java.awt.image.BufferedImage, dw: Int, dh: Int): java.awt.image.BufferedImage = {
    val sw = src.getWidth; val sh = src.getHeight
    val out = new java.awt.image.BufferedImage(
      dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dh) {
      val y0 = y * sh / dh
      val y1 = math.max(y0 + 1, (y + 1) * sh / dh)
      var x = 0
      while (x < dw) {
        val x0 = x * sw / dw
        val x1 = math.max(x0 + 1, (x + 1) * sw / dw)
        var sr = 0L; var sg = 0L; var sb = 0L
        var sy = y0
        while (sy < y1) {
          var sx = x0
          while (sx < x1) {
            val rgb = src.getRGB(sx, sy)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            sx += 1
          }
          sy += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        out.setRGB(x, y,
          (((sr / n).toInt) << 16) | (((sg / n).toInt) << 8) | (sb / n).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** BT.601 per-mille luma grid of a decoded image, box-filtered to
    * `gw`×`gh` with the same pinned integer semantics as [[resizePixels]]
    * but summing LUMA (299r+587g+114b per source pixel) before the floor
    * division — the input representation for perceptual hashing.
    */
  def lumaGrid(src: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Array[Long]] = {
    val sw = src.getWidth; val sh = src.getHeight
    Array.tabulate(gh, gw) { (y, x) =>
      val x0 = x * sw / gw; val x1 = math.max(x0 + 1, (x + 1) * sw / gw)
      val y0 = y * sh / gh; val y1 = math.max(y0 + 1, (y + 1) * sh / gh)
      var s = 0L
      var sy = y0
      while (sy < y1) {
        var sx = x0
        while (sx < x1) {
          val rgb = src.getRGB(sx, sy)
          s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
            114L * (rgb & 0xFF)
          sx += 1
        }
        sy += 1
      }
      s / ((x1 - x0).toLong * (y1 - y0))
    }
  }

  /** Difference-hash bit width: an 8×8 luma grid gives 7 horizontal
    * comparisons per row × 8 rows = 56 bits — deliberately < 64 so the
    * hash is always a non-negative BIGINT in every engine.
    */
  val DHashBits = 56

  /** 56-bit perceptual difference hash (dHash): box-filter the luma to an
    * 8×8 grid, set bit y·7+x when grid(y)(x+1) > grid(y)(x). Invariant to
    * uniform brightness shifts and robust to small pixel noise — the image
    * analog of SimHash for near-duplicate detection. None when the payload
    * doesn't decode.
    */
  def dHash(payload: Array[Byte]): Option[Long] = {
    val img = decodeImage(payload).getOrElse(return None)
    val g = lumaGrid(img, 8, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y)(x + 1) > g(y)(x)) h |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    Some(h)
  }

  /** Per-row dHash column via the standard partition-batched decode shape;
    * undecodable payloads get null.
    */
  def withDHash(df: DataFrame, payloadCol: String = "payload",
                outCol: String = "dhash"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, LongType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val h: Any =
          if (bytes == null) null else dHash(bytes).map(Long.box).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Image near-duplicate pairs by dHash Hamming distance ≤ maxDist — the
    * [[graft.ops.Dedup.simhashPairs]] shape applied to pixels via the
    * shared [[Hamming.pairs]] core: exact recall by pigeonhole (maxDist+1
    * chunks), candidates bucket-local behind the skew-guarded grid split,
    * never an all-pairs join.
    */
  def imageNearDups(df: DataFrame, idCol: String,
                    payloadCol: String = "payload",
                    maxDist: Int = 3): DataFrame =
    Hamming.pairs(
      withDHash(df, payloadCol).select(col(idCol).as("id"), col("dhash")),
      DHashBits, maxDist, sigCol = "dhash")

  /** 56-bit audio envelope hash over REAL decoded 16-bit PCM: the sample
    * stream splits into 57 equal index windows (window of sample i =
    * i·57/n, floor), each window reduces to its exact integer Σ|s|
    * loudness, and bit j is set when window j+1 is louder than window j —
    * the audio analog of [[dHash]] (level-shift invariant: scaling every
    * sample by a constant preserves all comparisons). None for
    * undecodable/too-short (< 57 samples) payloads.
    */
  def audioHash(payload: Array[Byte]): Option[Long] =
    AudioMeta.pcm16Samples(payload).flatMap { s =>
      val n = s.length
      if (n < 57) None
      else {
        val e = new Array[Long](57)
        var i = 0
        while (i < n) {
          e((i.toLong * 57 / n).toInt) += math.abs(s(i).toLong)
          i += 1
        }
        var h = 0L
        var j = 0
        while (j < DHashBits) {
          if (e(j + 1) > e(j)) h |= 1L << j
          j += 1
        }
        Some(h)
      }
    }

  /** Per-row audio hash column (standard partition-batched decode shape). */
  def withAudioHash(df: DataFrame, payloadCol: String = "payload",
                    outCol: String = "ahash"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, LongType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val h: Any =
          if (bytes == null) null else audioHash(bytes).map(Long.box).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Audio near-duplicate pairs by envelope-hash Hamming distance — same
    * exact-recall banded shape as [[imageNearDups]].
    */
  def audioNearDups(df: DataFrame, idCol: String,
                    payloadCol: String = "payload",
                    maxDist: Int = 3): DataFrame =
    Hamming.pairs(
      withAudioHash(df, payloadCol).select(col(idCol).as("id"), col("ahash")),
      DHashBits, maxDist, sigCol = "ahash")

  /** End-to-end image deduplication: perceptual pairs → duplicate-cluster
    * resolution → min-id representative per cluster, the
    * [[graft.ops.Dedup.deduplicate]] shape over pixels. Rows whose payload
    * doesn't decode keep (they produced no pairs).
    */
  def deduplicateImages(df: DataFrame, idCol: String,
                        payloadCol: String = "payload",
                        maxDist: Int = 3): DataFrame = {
    val pairs = imageNearDups(df, idCol, payloadCol, maxDist)
    val drops = Dedup.duplicateClusters(pairs)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as(s"__drop_$idCol"))
    df.join(drops, col(idCol) === col(s"__drop_$idCol"), "left_anti")
  }

  /** Partition-batched image resize: decode (`javax.imageio`), box-filter
    * resize to fit `maxSide` ([[thumbDims]] + [[resizePixels]]), re-encode
    * as PNG (lossless — downstream [[featurize]] recovers the resized
    * pixels exactly). Undecodable payloads pass through as null. Per-row
    * work, no shuffle; at 100 TB this is a pure map stage whose cost is
    * decode-bound and scales linearly with payload bytes.
    */
  def resizeImages(df: DataFrame, maxSide: Int, payloadCol: String = "payload",
                   outCol: String = "payload_resized"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val resized: Array[Byte] =
          if (bytes == null) null
          else decodeImage(bytes).map { img =>
            val (dw, dh) = thumbDims(img.getWidth, img.getHeight, maxSide)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(resizePixels(img, dw, dh), "png", bos)
            bos.toByteArray
          }.orNull
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }
}
