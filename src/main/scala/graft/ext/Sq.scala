package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 scalar quantization (SQ8) for embedding
  * storage — the 4× compression tier between raw float vectors and
  * [[Pq]]'s product codes (the faiss `ScalarQuantizer QT_8bit`
  * configuration): scale = max|x|/127, code_i = round(x_i/scale) ∈
  * [−127, 127], reconstruction x̂_i = code_i·scale with per-element
  * error ≤ scale/2. Unlike PQ the codes preserve per-dimension
  * structure, so exact search over reconstructions loses almost no
  * recall — SQ8 is what a 100 TB embedding store keeps HOT (4× less
  * scan IO at ~0.99 recall) while raw floats stay cold and PQ serves
  * the in-memory shortlist tier.
  *
  * Every step is deterministic single-IEEE-op arithmetic (float→double
  * exact, one division, round-half-away-from-zero, one multiply), so
  * the whole codec replays bit-for-bit in the DuckDB oracle — no
  * training state, unlike PQ's codebooks.
  *
  * Scale shape: pure per-row map — no shuffle, no pairing, nothing
  * collected. Quantization cost is one pass over the vectors.
  */
object Sq {

  /** max|x_i| of a float vector, in double (float→double is exact). */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Quantize `vecCol` → (idCol, scale, codes). A zero vector gets
    * scale 0 and all-zero codes (the division is guarded); the max
    * element always maps to ±127 exactly (|x|max/scale = 127, no
    * rounding tie). `keepVec` keeps the source vector alongside the
    * codes, for error-audit readouts.
    */
  def quantize(df: DataFrame, vecCol: String, idCol: String,
               keepVec: Boolean = false): DataFrame = {
    // a NaN/Inf element (upstream bug) must surface as an explicit
    // null encoding, not as silently-garbage codes: maxAbs propagates
    // the non-finite value, and the guard nulls scale+codes for the
    // whole vector (SqSpec pins it)
    val rawScale = maxAbs(col("__v")) / lit(127.0)
    val enc = df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("scale",
        when(isnan(rawScale) || rawScale === Double.PositiveInfinity,
          lit(null).cast("double")).otherwise(rawScale))
      .withColumn("codes",
        when(col("scale").isNull, lit(null).cast("array<int>"))
          .when(col("scale") === 0.0,
            transform(col("__v"), _ => lit(0)))
          .otherwise(transform(col("__v"),
            x => round(x.cast("double") / col("scale")).cast("int"))))
    if (keepVec) enc.withColumnRenamed("__v", vecCol)
      .select(col(idCol), col(vecCol), col("scale"), col("codes"))
    else enc.select(col(idCol), col("scale"), col("codes"))
  }

  /** Reconstruction as `array<float>` under the original column name,
    * ready for the same codegen'd cosine kernels the raw vectors use
    * ([[graft.functions.VectorExpressions]] floats-only fast path; the
    * double→float cast costs ≤ half an ulp on values already quantized
    * to 8 bits).
    */
  def dequantize(enc: DataFrame, vecCol: String, idCol: String): DataFrame =
    enc.select(col(idCol),
      transform(col("codes"), c => (c.cast("double") * col("scale")).cast("float"))
        .as(vecCol))

  /** Exact cosine top-k over the RECONSTRUCTED corpus — the SQ8 search
    * path (queries stay full-precision; the asymmetric-distance form).
    * Same candidate flow as [[Similarity.bruteForceTopK]]: corpus maps
    * in place, only nQueries×k candidate rows move.
    */
  def sqTopK(enc: DataFrame, queries: DataFrame,
             vecCol: String, idCol: String, k: Int): DataFrame =
    Similarity.bruteForceTopK(dequantize(enc, vecCol, idCol), queries,
      vecCol, idCol, k)
}
