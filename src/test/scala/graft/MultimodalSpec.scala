package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: schema, determinism, null blobs") {
    val df = Seq(
      (1L, "img", Array[Byte](1, 2, 3, 4, 5)),
      (2L, "img", Array[Byte](1, 2, 3, 4, 5)),
      (3L, "img", null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "kind", "blob")
    val out = Multimodal.extractFeatures(df, "blob", dim = 4)
    assert(out.columns === Array("media_id", "kind", "byte_len", "sha_prefix", "feature"))
    val rows = out.orderBy("media_id").collect()
    assert(rows(0).getAs[Long]("byte_len") === 5L)
    // determinism: same bytes -> same stub feature
    assert(rows(0).getSeq[Float](rows(0).fieldIndex("feature")) ===
      rows(1).getSeq[Float](rows(1).fieldIndex("feature")))
    // null blob -> null features, row preserved
    assert(rows(2).isNullAt(rows(2).fieldIndex("feature")))
  }

  test("stubDecode folds bytes deterministically into dim buckets") {
    val f = Multimodal.stubDecode(Array[Byte](0, 1, 2, 3), dim = 2)
    assert(f.length === 2)
    assert(math.abs(f(0) - (0 + 2) / 255.0f) < 1e-6)
    assert(math.abs(f(1) - (1 + 3) / 255.0f) < 1e-6)
  }

  test("resize: blob replaced partition-wise, dims recorded, null-safe") {
    val df = Seq(
      (1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "blob")
    val out = Multimodal.resize(df, "blob", width = 64, height = 64).orderBy("media_id").collect()
    assert(out(0).getAs[Array[Byte]]("blob") !== null)
    assert(out(0).getAs[Int]("resized_width") === 64)
    assert(out(0).getAs[Int]("resized_height") === 64)
    assert(out(1).isNullAt(out(1).fieldIndex("blob"))) // null stays null
    // determinism: same input → same resized payload
    val again = Multimodal.resize(df, "blob", 64, 64).orderBy("media_id").collect()
    assert(out(0).getAs[Array[Byte]]("blob").toSeq === again(0).getAs[Array[Byte]]("blob").toSeq)
  }

  test("sampleFrames: one row per offset, per-frame features distinct, inner semantics") {
    val df = Seq(
      (1L, Array[Byte](9, 8, 7), Option(2500L)),
      (2L, Array[Byte](1, 2, 3), Option(0L)),          // zero duration → no frames
      (3L, null.asInstanceOf[Array[Byte]], Option(5000L)) // null blob → no frames
    ).toDF("media_id", "blob", "duration_ms")
    val out = Multimodal.sampleFrames(df, "blob", "duration_ms", everyMs = 1000, dim = 4)
    assert(out.columns === Array("media_id", "duration_ms", "frame_ms", "frame_feature"))
    val rows = out.orderBy("media_id", "frame_ms").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))) ===
      Array((1L, 0L), (1L, 1000L), (1L, 2000L)))
    // offset folded in → frames of one video differ
    val f0 = rows(0).getSeq[Float](3); val f1 = rows(1).getSeq[Float](3)
    assert(f0 !== f1)
  }

  test("imageNearDups: banding over the stub perceptual hash finds near-identical blobs") {
    val base = Array.tabulate[Byte](256)(i => (i % 97).toByte)
    val near = base.clone(); near(40) = 99 // one-byte tweak: few signature bits flip
    // descending ramps: every sampled pair descends where the base's
    // ascend — all 64 signature bits differ
    val far = Array.tabulate[Byte](256)(i => (255 - (i % 97)).toByte)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("media_id", "blob")
    val pairs = Multimodal.imageNearDups(df, "blob", "media_id",
        maxHamming = 6, prefixBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-identical blobs must pair")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated blob must not pair")
  }

  test("signatureNearDups (shared banding core) honors the hamming threshold") {
    import graft.ext.Dedup
    val sigs = Seq(
      (1L, 0x0F0F0F0F0F0F0F0FL),
      (2L, 0x0F0F0F0F0F0F0F0CL), // hamming 2 from 1
      (3L, 0x0F0F0F0F0F0FFF0FL), // hamming 4 from 1 (6 from 2: disjoint flips)
      (4L, -0x0F0F0F0F0F0F0F10L) // far from everything
    ).toDF("id", "sh")
    val h2 = Dedup.signatureNearDups(sigs, maxHamming = 2, prefixBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h2 === Set((1L, 2L)))
    val h4 = Dedup.signatureNearDups(sigs, maxHamming = 4, prefixBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h4 === Set((1L, 2L), (1L, 3L)))
    val h6 = Dedup.signatureNearDups(sigs, maxHamming = 6, prefixBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(h6 === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("frameSampleOffsets: every Nms within duration, empty for null/zero") {
    val df = Seq((1L, Option(2500L)), (2L, Option(0L)), (3L, Option.empty[Long]))
      .toDF("id", "duration_ms")
      .select(col("id"), Multimodal.frameSampleOffsets("duration_ms", 1000).as("offs"))
    val out = df.orderBy("id").as[(Long, Seq[Long])].collect()
    assert(out(0)._2 === Seq(0L, 1000L, 2000L))
    assert(out(1)._2 === Seq.empty)
    assert(out(2)._2 === Seq.empty)
  }
}
