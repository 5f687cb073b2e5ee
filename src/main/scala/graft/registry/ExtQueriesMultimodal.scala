package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — image/audio/video columns.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesMultimodal {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_multimodal_frames" -> ((s, d) => {
      // ORACLE-GATED frame sampling over REAL decoded stills (each doc's
      // blob is a deterministic executor-rendered PNG; the JDK has no
      // video codec, so the frame GRAB is the one remaining stub). The
      // oracle replays the row-per-frame shape, offsets, and zero-
      // duration inner semantics; the decoded feature rides along as a
      // range verdict (profile ∈ [0,1] + normalized shift ∈ [0,1))
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val blobs = t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), render(col("doc_id")).as("blob"),
          (col("n_chars") % 5 * 1000).cast("long").as("duration_ms"))
      graft.ext.Multimodal.sampleFrames(blobs, "blob", "duration_ms",
          everyMs = 1000, dim = 4)
        .select(col("doc_id"), col("duration_ms"), col("frame_ms"),
          (element_at(col("frame_feature"), 1) >= 0 &&
            element_at(col("frame_feature"), 1) < 2).as("f0_ok"))
        .orderBy("doc_id", "frame_ms")
    }),

    "x_multimodal_neardup" -> ((s, d) => {
      // ORACLE-GATED perceptual near-dup over REAL images: javax.imageio
      // decode + true dHash through the shared Charikar banding in its
      // pigeonhole-EXACT regime (rotations=8 × prefixBits=8 finds every
      // pair within hamming ≤ 4 deterministically). Every 7th doc gets a
      // planted 2-pixel-noised twin (≤ 4 flipped bits), and distinct
      // mosaic seeds sit ~32 bits apart — so the found pairs are EXACTLY
      // the planted ones, which the oracle enumerates in SQL
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val renderNoisy = udf((id: Long) =>
        graft.ext.Multimodal.renderPng(id, noisePixels = 2))
      val docs = t(s, d, "documents").filter(col("doc_id") < 2000)
      val base = docs.select(col("doc_id"), render(col("doc_id")).as("blob"))
      val twins = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          renderNoisy(col("doc_id")).as("blob"))
      graft.ext.Multimodal.imageNearDups(base.unionByName(twins), "blob", "doc_id",
          maxHamming = 4, prefixBits = 8, rotations = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "x_multimodal_features" -> ((s, d) => {
      // ORACLE-GATED: REAL javax.imageio decode over executor-rendered
      // PNG blobs — media_kind/width/height only come out 'image'/32/32
      // if the codec actually decoded every blob, which is exactly what
      // the oracle asserts row by row (the luminance profile itself is
      // verified by x_multimodal_selfcheck's independent replay)
      val render = udf((id: Long) => graft.ext.Multimodal.renderPng(id))
      val blobs = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), render(col("doc_id")).as("blob"))
      graft.ext.Multimodal.extractFeatures(blobs, "blob", dim = 8)
        .select(col("doc_id"), col("media_kind"), col("width"), col("height"))
        .orderBy("doc_id")
    }),

    "x_sniff_media" -> ((s, d) => {
      // ORACLE-GATED magic-number routing: blobs rendered per doc as
      // PNG / animated GIF / WAV / raw text bytes by doc_id mod 4 — the
      // codegen'd sniffer must label every one correctly, which the
      // oracle enumerates as the expected CASE per row. The cheap
      // pre-filter a 100 TB mixed-media scan runs BEFORE any try-decode
      val render = udf { (id: Long) =>
        (id % 4) match {
          case 0 => graft.ext.Multimodal.renderPng(id)
          case 1 => graft.ext.Multimodal.renderGif(id, frames = 2)
          case 2 => graft.ext.Multimodal.renderWav(id, nSamples = 800)
          case _ => s"plain text payload $id".getBytes("UTF-8")
        }
      }
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          graft.ext.Multimodal.sniffMediaType(render(col("doc_id"))).as("media_type"))
        .orderBy("doc_id")
    }),

    "x_gif_frames" -> ((s, d) => {
      // ORACLE-GATED real frame grab: each doc's blob is a 4-frame
      // animated GIF (500 ms/frame); sampleFrames selects the frame
      // DISPLAYED at each 500 ms offset and its decoded feature must
      // equal an independent decode of that frame's source mosaic —
      // byte-for-byte float equality, folded into a verdict column the
      // oracle replays alongside the offsets
      val render = udf((id: Long) =>
        graft.ext.Multimodal.renderGif(id, frames = 4, delayMs = 500))
      val replay = udf { (id: Long, ms: Long) =>
        graft.ext.Multimodal.imageFeature(
          graft.ext.Multimodal.decodeImage(
            graft.ext.Multimodal.renderPng(id + ms / 500)).get, 4).toSeq
      }
      val blobs = t(s, d, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), render(col("doc_id")).as("blob"),
          lit(2000L).as("duration_ms"))
      graft.ext.Multimodal.sampleFrames(blobs, "blob", "duration_ms",
          everyMs = 500, dim = 4)
        .select(col("doc_id"), col("frame_ms"),
          (col("frame_feature") === replay(col("doc_id"), col("frame_ms")))
            .as("frame_matches_still"))
        .orderBy("doc_id", "frame_ms")
    }),

    "x_audio_neardup" -> ((s, d) => {
      // ORACLE-GATED perceptual audio near-dup: real javax.sound WAV
      // decode → RMS envelope signature → the shared Charikar banding
      // in its pigeonhole-exact regime. Every 7th doc gets a planted
      // one-segment-retouched twin (≤ 2 flipped bits of 64); distinct
      // amplitude-walk seeds sit ~32 bits apart — the found pairs are
      // exactly the planted ones, enumerated by the oracle in SQL
      val render = udf((id: Long) => graft.ext.Multimodal.renderWavMod(id))
      val renderNoisy = udf((id: Long) =>
        graft.ext.Multimodal.renderWavMod(id, noiseSegs = 1))
      val docs = t(s, d, "documents").filter(col("doc_id") < 1000)
      val base = docs.select(col("doc_id"), render(col("doc_id")).as("blob"))
      val twins = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          renderNoisy(col("doc_id")).as("blob"))
      graft.ext.Multimodal.audioNearDups(base.unionByName(twins), "blob", "doc_id",
          maxHamming = 4, prefixBits = 8, rotations = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "x_multimodal_selfcheck" -> ((s, d) =>
      // ORACLE-GATED media-kernel verdicts: decode dims, independent
      // feature replay, dHash locality, resize round-trip, WAV decode,
      // planted-twin near-dup recall — each boolean computed ON the
      // engine over executor-rendered fixtures; the oracle hash-matches
      // the literal expected verdicts, so the driver gate sees pass/fail
      graft.ext.Multimodal.selfCheck(
        t(s, d, "documents").filter(col("doc_id") < 50), "doc_id")),
  )

  val oracles: Map[String, String] = Map(
    // the decoded dims/kind are only 'image'/32/32 when the codec
    // really decoded each rendered blob — the oracle asserts that per row
    "x_multimodal_features" ->
      """SELECT doc_id, 'image' AS media_kind, 32 AS width, 32 AS height
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // frame offsets replay in SQL (range list per doc, inner semantics:
    // zero duration → no rows); the decoded-feature range rides as f0_ok
    "x_multimodal_frames" ->
      """SELECT doc_id, duration_ms, unnest(range(0, duration_ms, 1000)) AS frame_ms,
        |       TRUE AS f0_ok
        |FROM (SELECT doc_id, CAST(n_chars % 5 * 1000 AS BIGINT) AS duration_ms
        |      FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id, frame_ms""".stripMargin,

    // the sniffer's verdict per rendered container type, row by row
    "x_sniff_media" ->
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
        |    WHEN 2 THEN 'audio/wav' ELSE 'application/octet-stream' END AS media_type
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // real per-frame GIF decode: offsets replay in SQL, frame fidelity
    // rides as the engine-computed equality verdict
    "x_gif_frames" ->
      """SELECT doc_id, unnest(range(0, 2000, 500)) AS frame_ms,
        |       TRUE AS frame_matches_still
        |FROM documents WHERE doc_id < 60
        |ORDER BY doc_id, frame_ms""".stripMargin,

    // pigeonhole-exact banding + ~32-bit envelope-seed separation ⇒ the
    // audio pair set is exactly the planted retouched twins
    "x_audio_neardup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents WHERE doc_id < 1000 AND doc_id % 7 = 0
        |ORDER BY id_a, id_b""".stripMargin,

    // pigeonhole-exact banding + ~32-bit seed separation ⇒ the pair set
    // is exactly the planted twins, enumerable in SQL
    "x_multimodal_neardup" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents WHERE doc_id < 2000 AND doc_id % 7 = 0
        |ORDER BY id_a, id_b""".stripMargin,

    // the media kernels run codecs a SQL engine doesn't have — the
    // self-check computes every invariant ENGINE-side and the oracle
    // hash-matches the literal expected verdicts
    "x_multimodal_selfcheck" ->
      """SELECT * FROM (VALUES
        |  ('decoded_all', TRUE), ('dhash_locality', TRUE),
        |  ('features_match', TRUE), ('gif_frames_real', TRUE),
        |  ('neardup_planted_twins', TRUE), ('resize_roundtrip', TRUE),
        |  ('wav_decode', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,
  )
}
