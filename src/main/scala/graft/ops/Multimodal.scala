package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and decode/featurize steps
  * run as partition-batched transforms (the Scala analog of `mapInPandas` —
  * one iterator per partition, batch-shaped work, no per-row driver calls).
  *
  * Header metadata decode is REAL ([[decodeMeta]] / [[ImageMeta]]: PNG, JPEG
  * and GIF dimensions parsed from the payload bytes, pure JVM). Only the
  * pixel-level feature extraction remains STUBBED (this container ships no
  * codec libraries): [[stubDecode]] produces a deterministic fake feature
  * vector derived from the payload bytes, so the Spark-side plumbing —
  * schema, partitioning, batch iteration, feature shape — is exercised
  * end-to-end and a real codec drops in by replacing one function.
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

  /** STUB decoder: a real implementation would decode the payload (JPEG,
    * WAV, MP4 frame sample, ...) here; this deterministic fake hashes byte
    * slices into a fixed-dim feature vector so shape/partitioning/batching
    * are exercised end-to-end.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(FeatureDim)(0.0)
    val out = new Array[Double](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      var h = 1125899906842597L + i
      var j = i
      while (j < payload.length) {
        h = 31 * h + payload(j)
        j += FeatureDim
      }
      out(i) = (h % 1000003L).toDouble / 1000003.0
      i += 1
    }
    out
  }

  /** Partition-batched featurize: the mapPartitions shape keeps decode work
    * executor-side with one setup per partition (where a real codec would
    * allocate its decoder), mirroring `mapInPandas` batch semantics.
    */
  def featurize(df: DataFrame, payloadCol: String = "payload",
                outCol: String = "features"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ stubDecode(bytes).toSeq)
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

  /** Payload-level statistics that need no decoding (real, not stubbed):
    * byte sizes and content fingerprints, one agg-able projection.
    */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("payload_bytes", length(col(payloadCol)).cast(LongType))
      .withColumn("payload_md5", md5(col(payloadCol)))
}
