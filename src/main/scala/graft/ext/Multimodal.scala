package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract run per-partition so a real decoder (JNI codec,
  * native lib) initializes once per task, not per row. The decode kernel
  * itself is STUBBED with a deterministic fake (media codecs aren't in
  * this container) — the Spark-side contract (schema, batch shape,
  * partition-wise execution, null-safety) is real and tested.
  *
  * Scale notes: media blobs dominate row size — keep them OUT of shuffle
  * keys, repartition by a small id before decode so tasks balance, and
  * project the blob column away as soon as features are extracted.
  */
object Multimodal {

  /** media metadata struct carried alongside the blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // "jpeg", "wav", ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha_prefix", StringType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode kernel: deterministic pseudo-features from the raw
    * bytes (xor-fold into a fixed-dim float vector). A real deployment
    * replaces ONLY this function body with the codec call; everything
    * around it (per-partition init, batching, output schema) stays.
    */
  def stubDecode(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    if (bytes == null) return null
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    acc
  }

  /** Extract features from a binary media column, partition-wise.
    * Output = input columns (minus the blob) + `featureSchema` fields.
    */
  def extractFeatures(df: DataFrame, blobCol: String, dim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val keptIdx = inSchema.fields.indices.filter(_ != blobIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init point: real codecs load their native state here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val kept = keptIdx.map(r.get)
        val feats: Seq[Any] =
          if (bytes == null) Seq(null, null, null)
          else Seq(bytes.length.toLong,
            java.lang.Long.toHexString(
              java.util.Arrays.hashCode(bytes).toLong & 0xffffffffL),
            stubDecode(bytes, dim).toSeq)
        Row.fromSeq(kept ++ feats)
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video: every `everyMs`
    * millisecond offsets within [0, durationMs). Pure column expression
    * — the actual frame grab happens inside the (stubbed) decode kernel.
    */
  def frameSampleOffsets(durationMsCol: String, everyMs: Int): org.apache.spark.sql.Column =
    when(col(durationMsCol).isNull || col(durationMsCol) <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), col(durationMsCol) - 1, lit(everyMs.toLong)))

  /** STUB resize kernel: deterministic byte-fold to the target pixel
    * budget (a real deployment replaces ONLY this body with the image
    * library call — signature and call site stay).
    */
  def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null) return null
    val out = new Array[Byte](math.max(1, math.min(bytes.length, w * h / 64)))
    var i = 0
    while (i < bytes.length) { out(i % out.length) = (out(i % out.length) ^ bytes(i)).toByte; i += 1 }
    out
  }

  /** Resize a binary image column partition-wise: blob replaced with the
    * (stub-)resized payload, target dimensions recorded alongside. Same
    * execution shape as [[extractFeatures]] — per-partition init for the
    * codec, blob never enters a shuffle key.
    */
  def resize(df: DataFrame, blobCol: String, width: Int, height: Int): DataFrame = {
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val outSchema = StructType(inSchema.fields.toSeq ++ Seq(
      StructField("resized_width", IntegerType, nullable = false),
      StructField("resized_height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init point for the real codec
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(blobIdx) = stubResize(r.getAs[Array[Byte]](blobIdx), width, height)
        Row.fromSeq(vals.toSeq ++ Seq(width, height))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled offset of each video
    * blob — (input columns minus the blob) + `frame_ms` + the frame's
    * stub-decoded feature vector. The frame grab runs inside the same
    * per-partition kernel; a parent with null/zero duration contributes
    * no frames (inner-explode semantics, like the flatten family).
    */
  def sampleFrames(df: DataFrame, blobCol: String, durationMsCol: String,
                   everyMs: Int, dim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val durIdx = inSchema.fieldIndex(durationMsCol)
    val keptIdx = inSchema.fields.indices.filter(_ != blobIdx)
    val outSchema = StructType(keptIdx.map(inSchema.fields(_)) ++ Seq(
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame_feature", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init point for the real codec
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val dur = if (r.isNullAt(durIdx)) 0L else r.getAs[Number](durIdx).longValue()
        if (bytes == null || dur <= 0) Iterator.empty
        else {
          val kept = keptIdx.map(r.get)
          (0L until dur by everyMs.toLong).iterator.map { ms =>
            // stub frame grab: fold the offset into the decode so each
            // frame's feature is distinct and deterministic
            val frame = stubDecode(bytes, dim)
            val shifted = frame.indices.map(i =>
              frame(i) + (ms.toFloat / math.max(1L, dur))).toArray
            Row.fromSeq(kept ++ Seq(ms, shifted.toSeq))
          }
        }
      }
    }(enc)
  }

  /** STUB perceptual hash: 64-bit signature from a difference walk over
    * the raw bytes — a real deployment replaces this body with dHash
    * over the decoded, resized grayscale image. Deterministic, and
    * nearby for byte streams differing in few positions (each byte
    * pair flips at most its own bit), so the banding downstream is
    * exercised honestly even by the fake.
    */
  def stubPerceptualHash64(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length < 2) return 0L
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      // compare a sampled byte pair per output bit (dHash shape:
      // brighter-than-right-neighbor, here greater-than-next-sample)
      val i = (bit.toLong * (bytes.length - 1) / 64).toInt
      val a = bytes(i) & 0xff
      val b = bytes(math.min(i + 1, bytes.length - 1)) & 0xff
      if (a > b) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Near-duplicate media detection: per-blob perceptual signature
    * (partition-wise map), then the SAME Charikar rotation-banded
    * hamming pair generation the text SimHash uses
    * ([[Dedup.signatureNearDups]]) — the banding, bucket join, and
    * popcount verify are real and shared; only the 64-bit signature
    * kernel is the documented stub.
    */
  def imageNearDups(df: DataFrame, blobCol: String, idCol: String,
                    maxHamming: Int = 6, prefixBits: Int = 12): DataFrame = {
    val spark = df.sparkSession
    val sigs = {
      val inSchema = df.schema
      val blobIdx = inSchema.fieldIndex(blobCol)
      val idIdx = inSchema.fieldIndex(idCol)
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", inSchema(idIdx).dataType),
        org.apache.spark.sql.types.StructField("sh",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val rdd = df.rdd.mapPartitions { rows =>
        rows.map { r =>
          Row(r.get(idIdx), stubPerceptualHash64(r.getAs[Array[Byte]](blobIdx)))
        }
      }
      spark.createDataFrame(rdd, outSchema)
    }
    Dedup.signatureNearDups(sigs, maxHamming, prefixBits)
  }
}
