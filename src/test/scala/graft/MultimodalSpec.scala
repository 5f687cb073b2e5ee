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
    assert(out.columns === Array("media_id", "kind", "byte_len", "sha_prefix",
      "media_kind", "width", "height", "feature"))
    val rows = out.orderBy("media_id").collect()
    assert(rows(0).getAs[Long]("byte_len") === 5L)
    // raw non-media bytes take the opaque fallback path
    assert(rows(0).getAs[String]("media_kind") === "opaque")
    // determinism: same bytes -> same feature
    assert(rows(0).getSeq[Float](rows(0).fieldIndex("feature")) ===
      rows(1).getSeq[Float](rows(1).fieldIndex("feature")))
    // null blob -> null features, row preserved
    assert(rows(2).isNullAt(rows(2).fieldIndex("feature")))
  }

  test("byteFoldFeature folds bytes deterministically into dim buckets") {
    val f = Multimodal.byteFoldFeature(Array[Byte](0, 1, 2, 3), dim = 2)
    assert(f.length === 2)
    assert(math.abs(f(0) - (0 + 2) / 255.0f) < 1e-6)
    assert(math.abs(f(1) - (1 + 3) / 255.0f) < 1e-6)
  }

  test("real decode: PNG blobs report image kind, true dimensions, luminance profile") {
    val png = Multimodal.renderPng(seed = 5L, w = 48, h = 24)
    val df = Seq((1L, png), (2L, Array[Byte](1, 2, 3))).toDF("media_id", "blob")
    val rows = Multimodal.extractFeatures(df, "blob", dim = 4)
      .orderBy("media_id").collect()
    assert(rows(0).getAs[String]("media_kind") === "image")
    assert(rows(0).getAs[Int]("width") === 48)
    assert(rows(0).getAs[Int]("height") === 24)
    val feat = rows(0).getSeq[Float](rows(0).fieldIndex("feature"))
    assert(feat.length === 4)
    // executor-side decode matches a local decode of the same bytes:
    // the pipeline really ran the codec, not a fold of the PNG stream
    val local = Multimodal.imageFeature(Multimodal.decodeImage(png).get, 4)
    assert(feat === local.toSeq)
    assert(feat.forall(v => v >= 0f && v <= 1f))
    assert(rows(1).getAs[String]("media_kind") === "opaque")
  }

  test("dHash64 produces the known signature for analytic gradients") {
    def gradient(ascending: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val lum = if (ascending) x * 4 - 1 max 0 else 255 - x * 4 + 1 min 255
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      img
    }
    // brightness strictly increases left→right: no left-cell is ever
    // brighter → all 64 dHash bits clear
    assert(Multimodal.dHash64(gradient(ascending = true)) === 0L)
    // strictly decreasing: every bit set
    assert(Multimodal.dHash64(gradient(ascending = false)) === -1L)
  }

  test("dHash64 is resize-invariant and locality-preserving on rendered PNGs") {
    def hash(bytes: Array[Byte]): Long =
      Multimodal.dHash64(Multimodal.decodeImage(bytes).get)
    val base = hash(Multimodal.renderPng(seed = 11L))
    // byte-identical render → identical hash
    assert(base === hash(Multimodal.renderPng(seed = 11L)))
    // a few flipped pixels → few flipped bits
    val noisy = hash(Multimodal.renderPng(seed = 11L, noisePixels = 3))
    assert(java.lang.Long.bitCount(base ^ noisy) <= 8,
      s"noise moved hash ${java.lang.Long.bitCount(base ^ noisy)} bits")
    // resize of the same image → hash survives for content the smaller
    // raster can still resolve (16px blocks stay 4px after a 4× shrink;
    // a 4px-block mosaic would alias away — that's physics, not dHash)
    val img = Multimodal.decodeImage(
      Multimodal.renderPng(seed = 11L, w = 64, h = 64, blockPx = 16)).get
    val small = Multimodal.decodeImage(Multimodal.resizeImagePng(img, 16, 16)).get
    assert(java.lang.Long.bitCount(Multimodal.dHash64(img) ^ Multimodal.dHash64(small)) <= 8)
  }

  test("resizeImagePng box-averages exactly and round-trips through the codec") {
    // 2×2 blocks of known gray values → 2×2 resize must equal block means
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val blocks = Seq(Seq(10, 20, 30, 40), Seq(50, 60, 70, 80)) // per-quadrant 2×2 values
    for (y <- 0 until 4; x <- 0 until 4) {
      val q = (y / 2) * 2 + (x / 2)
      val v = blocks(q / 2)(q % 2 * 2 + (y % 2)) + (x % 2) // distinct but mean-known
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = Multimodal.decodeImage(Multimodal.resizeImagePng(img, 2, 2)).get
    assert(out.getWidth === 2 && out.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 2) {
      // recompute the expected integer box mean from the source
      var sum = 0
      for (sy <- y * 2 until y * 2 + 2; sx <- x * 2 until x * 2 + 2)
        sum += img.getRGB(sx, sy) & 0xff
      assert((out.getRGB(x, y) & 0xff) === sum / 4)
    }
  }

  test("real WAV decode: samples, energy profile, and feature routing") {
    val wav = Multimodal.renderWav(seed = 4L, nSamples = 8000)
    val samples = Multimodal.decodeWav(wav).get
    assert(samples.length === 8000)
    assert(math.abs(samples.max) <= 12001f / 32768f)
    // constant-amplitude sine: RMS per segment ≈ amp/sqrt(2)
    val prof = Multimodal.audioEnergyProfile(samples, dim = 4)
    val expect = 12000f / 32768f / math.sqrt(2).toFloat
    prof.foreach(p => assert(math.abs(p - expect) < 0.02f, s"profile $p vs $expect"))
    // pipeline routing: wav blob → media_kind=audio, no dimensions
    val row = Multimodal.extractFeatures(
        Seq((1L, wav)).toDF("media_id", "blob"), "blob", dim = 4)
      .collect().head
    assert(row.getAs[String]("media_kind") === "audio")
    assert(row.isNullAt(row.fieldIndex("width")))
  }

  test("imageNearDups pairs a noised PNG twin via real dHash, not unrelated images") {
    val df = Seq(
      (1L, Multimodal.renderPng(seed = 21L)),
      (2L, Multimodal.renderPng(seed = 21L, noisePixels = 2)), // near twin
      (3L, Multimodal.renderPng(seed = 1234567L))              // unrelated gradient
    ).toDF("media_id", "blob")
    val pairs = Multimodal.imageNearDups(df, "blob", "media_id",
        maxHamming = 8, prefixBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"noised twin must pair, got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated image must not pair, got $pairs")
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

  test("audioSignature64: gain-invariant, localized edits flip at most 2 bits per segment") {
    def sig(seed: Long, noise: Int = 0): Long =
      Multimodal.audioSignature64(
        Multimodal.decodeWav(Multimodal.renderWavMod(seed, noise)).get)
    // identical render → identical signature
    assert(sig(3L) === sig(3L))
    // one retouched segment → at most 2 flipped comparisons
    assert(java.lang.Long.bitCount(sig(3L) ^ sig(3L, noise = 1)) <= 2)
    // unrelated amplitude walks → far apart (expected ~32 of 64)
    assert(java.lang.Long.bitCount(sig(3L) ^ sig(77L)) > 8)
    // uniform gain invariance: scale every sample by one factor
    val samples = Multimodal.decodeWav(Multimodal.renderWavMod(3L)).get
    val scaled = samples.map(x => x * 0.5f)
    assert(Multimodal.audioSignature64(samples) === Multimodal.audioSignature64(scaled))
  }

  test("audioNearDups pairs a retouched WAV twin, not unrelated audio") {
    val df = Seq(
      (1L, Multimodal.renderWavMod(40L)),
      (2L, Multimodal.renderWavMod(40L, noiseSegs = 1)),
      (3L, Multimodal.renderWavMod(888L))
    ).toDF("media_id", "blob")
    val pairs = Multimodal.audioNearDups(df, "blob", "media_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
  }

  test("sniffMediaType routes by magic numbers without decoding") {
    val cases = Seq(
      Multimodal.renderPng(1L) -> "image/png",
      Multimodal.renderGif(2L, frames = 2) -> "image/gif",
      Multimodal.renderWav(3L, nSamples = 100) -> "audio/wav",
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) -> "image/jpeg",
      "PKrest".getBytes("ISO-8859-1") -> "application/zip",
      "hello world".getBytes("UTF-8") -> "application/octet-stream",
      // truncated header: shorter than any magic → octet-stream
      Array[Byte]('G', 'I') -> "application/octet-stream")
    val got = cases.map(_._1).zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "blob")
      .select(col("i"), Multimodal.sniffMediaType(col("blob")).as("t"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got === cases.map(_._2))
    // null blob → null label
    val n = Seq((1, null.asInstanceOf[Array[Byte]])).toDF("i", "blob")
      .select(Multimodal.sniffMediaType(col("blob"))).collect().head
    assert(n.isNullAt(0))
  }

  test("decodeFrames renders zero-delay GIFs at the 100ms browser convention") {
    val gif = Multimodal.renderGif(seed = 2L, frames = 3, delayMs = 0)
    val frames = Multimodal.decodeFrames(gif)
    assert(frames.map(f => (f._1, f._2)) === Seq((0L, 100L), (100L, 200L), (200L, 300L)))
  }

  test("sampleFrames grabs REAL frames from an animated GIF, looping past the end") {
    val gif = Multimodal.renderGif(seed = 9L, frames = 4, delayMs = 500)
    val df = Seq((1L, gif, 3000L)).toDF("media_id", "blob", "duration_ms")
    val rows = Multimodal.sampleFrames(df, "blob", "duration_ms", everyMs = 500, dim = 4)
      .orderBy("frame_ms").collect()
    assert(rows.map(_.getLong(2)).toSeq === Seq(0L, 500L, 1000L, 1500L, 2000L, 2500L))
    def feat(i: Int) = rows(i).getSeq[Float](3)
    // four distinct frames, each matching an independent decode of its
    // source mosaic
    for (f <- 0 until 4)
      assert(feat(f) === Multimodal.imageFeature(
        Multimodal.decodeImage(Multimodal.renderPng(9L + f)).get, 4).toSeq)
    assert(feat(0) !== feat(1))
    // the animation is 2000ms long: sampling at 2000/2500 loops back
    assert(feat(4) === feat(0))
    assert(feat(5) === feat(1))
  }

  test("selfCheck: every media-kernel invariant verdict is true") {
    val ids = spark.range(30).toDF("doc_id")
    val rows = Multimodal.selfCheck(ids, "doc_id")
      .as[(String, Boolean)].collect().toSeq
    assert(rows.map(_._1) === Seq("decoded_all", "dhash_locality",
      "features_match", "gif_frames_real", "neardup_planted_twins",
      "resize_roundtrip", "wav_decode"))
    rows.foreach { case (name, ok) => assert(ok, s"check $name failed") }
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
