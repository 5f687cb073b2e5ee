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
