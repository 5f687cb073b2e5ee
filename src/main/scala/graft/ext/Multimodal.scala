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
}
