package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract run per-partition so the codec initializes once per
  * task, not per row. The decode kernels are REAL for the formats the
  * JDK ships codecs for — `javax.imageio` (PNG/JPEG/BMP/GIF) for
  * images, `javax.sound.sampled` (PCM WAV) for audio. Blobs neither
  * codec accepts fall back to a deterministic byte-fold signature, so
  * mixed/unknown media still flow through the same plumbing instead of
  * erroring mid-job (at 100 TB some fraction of blobs IS corrupt).
  * Video frame-grab is the one remaining stub: the JDK has no video
  * codec, so the per-offset frame feature is derived from the blob +
  * offset deterministically; the row-per-frame shape, offsets, and
  * null/zero-duration semantics are the real contract.
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
    StructField("media_kind", StringType),   // "image" | "audio" | "opaque"
    StructField("width", IntegerType),       // image only
    StructField("height", IntegerType),      // image only
    StructField("feature", ArrayType(FloatType))))

  // ===== real image kernels (javax.imageio — in the JDK, no native deps) =====

  /** Decode an image blob. `None` for null/corrupt/non-image bytes — the
    * caller decides the fallback; a decoder that THROWS on byte garbage
    * would kill a 100 TB job on its first bad row.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null) return None
    try {
      // no temp-file cache on executors — decode stays in-memory
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    } catch { case _: Exception => None }
  }

  /** Box-average grayscale grid `gw`×`gh` (row-major). Integer-weighted
    * ITU-R 601 luminance ((299r+587g+114b)/1000) accumulated in longs,
    * one float division per cell — bit-deterministic on any executor,
    * which is what lets dHash signatures join across tasks.
    */
  def grayGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Float](gw * gh)
    // bulk row fetches: per-pixel getRGB goes through the color-model
    // conversion path on every call and dominates per-image cost on
    // non-tiny images; one getRGB per ROW amortizes it. Long sums keep
    // the math identical to the per-pixel form (associative adds), so
    // signatures are bit-for-bit unchanged.
    val rowBuf = new Array[Int](w)
    val sums = new Array[Long](gw)
    val ns = new Array[Int](gw)
    var gy = 0
    while (gy < gh) {
      val y0 = (gy.toLong * h / gh).toInt
      val y1 = math.min(math.max(y0 + 1, ((gy + 1).toLong * h / gh).toInt), h)
      java.util.Arrays.fill(sums, 0L)
      java.util.Arrays.fill(ns, 0)
      var y = y0
      while (y < y1) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var gx = 0
        while (gx < gw) {
          val x0 = (gx.toLong * w / gw).toInt
          val x1 = math.min(math.max(x0 + 1, ((gx + 1).toLong * w / gw).toInt), w)
          var s = 0L
          var x = x0
          while (x < x1) {
            val p = rowBuf(x)
            s += (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
            x += 1
          }
          sums(gx) += s; ns(gx) += x1 - x0
          gx += 1
        }
        y += 1
      }
      var gx = 0
      while (gx < gw) {
        out(gy * gw + gx) = if (ns(gx) == 0) 0f else sums(gx).toFloat / ns(gx)
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Real dHash: 9×8 box-averaged gray grid, one bit per horizontally
    * adjacent cell pair (set when the left cell is brighter). The
    * standard difference-hash — invariant to uniform brightness shifts
    * and to resizing, so re-encoded / rescaled copies land within a few
    * bits of each other.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var sig = 0L; var bit = 0; var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) sig |= (1L << bit)
        bit += 1; x += 1
      }
      y += 1
    }
    sig
  }

  /** Image feature vector: `dim` vertical-strip mean luminances scaled
    * to [0,1] — a compact brightness profile that survives re-encode.
    */
  def imageFeature(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = grayGrid(img, dim, 1)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = g(i) / 255.0f; i += 1 }
    out
  }

  /** Deterministic box-average resample to `w`×`h`, re-encoded PNG.
    * Manual per-channel integer box averaging (not Graphics2D, whose
    * output depends on rendering-hint defaults) so two executors always
    * produce byte-identical payloads — resized blobs stay exact-dedup-able.
    */
  def resizeImagePng(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth; val sh = img.getHeight
    // bulk row fetches, as in [[grayGrid]]: one color-model conversion
    // per source ROW instead of per pixel; Long channel sums keep the
    // averages bit-identical to the per-pixel form
    val rowBuf = new Array[Int](sw)
    val rsums = new Array[Long](w); val gsums = new Array[Long](w)
    val bsums = new Array[Long](w); val ns = new Array[Int](w)
    var y = 0
    while (y < h) {
      val y0 = (y.toLong * sh / h).toInt
      val y1 = math.min(math.max(y0 + 1, ((y + 1).toLong * sh / h).toInt), sh)
      java.util.Arrays.fill(rsums, 0L); java.util.Arrays.fill(gsums, 0L)
      java.util.Arrays.fill(bsums, 0L); java.util.Arrays.fill(ns, 0)
      var yy = y0
      while (yy < y1) {
        img.getRGB(0, yy, sw, 1, rowBuf, 0, sw)
        var x = 0
        while (x < w) {
          val x0 = (x.toLong * sw / w).toInt
          val x1 = math.min(math.max(x0 + 1, ((x + 1).toLong * sw / w).toInt), sw)
          var xx = x0
          while (xx < x1) {
            val p = rowBuf(xx)
            rsums(x) += (p >> 16) & 0xff; gsums(x) += (p >> 8) & 0xff
            bsums(x) += p & 0xff
            xx += 1
          }
          ns(x) += x1 - x0
          x += 1
        }
        yy += 1
      }
      var x = 0
      while (x < w) {
        val n = if (ns(x) == 0) 1 else ns(x)
        out.setRGB(x, y,
          ((rsums(x) / n).toInt << 16) | ((gsums(x) / n).toInt << 8) | (bsums(x) / n).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** splitmix64 finalizer — the seed scrambler behind the synthetic
    * renders; full-avalanche so nearby seeds give uncorrelated pixels.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic synthetic PNG from a seed: a seeded 4×4-pixel block
    * mosaic (block luminance = splitmix64(seed, bx, by)) plus
    * `noisePixels` single-pixel inversions at seeded positions. A
    * MOSAIC, not a gradient — smooth gradients all look alike to a
    * difference hash, while distinct mosaic seeds give uncorrelated
    * dHash signatures (~32 expected hamming) and a noised re-render of
    * the same seed stays within a few bits. Rendered ON EXECUTORS by
    * specs and the self-check queries so the real decode path is
    * exercised end-to-end without shipping binary fixtures (two renders
    * of the same seed are byte-identical).
    */
  def renderPng(seed: Long, w: Int = 32, h: Int = 32, noisePixels: Int = 0,
                blockPx: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val lum = (mix64(seed ^ (x / blockPx * 0x100000001L) ^
          ((y / blockPx).toLong << 17)) & 0xff).toInt
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    var k = 0
    while (k < noisePixels) {
      val z = mix64(seed * 31 + k + 1)
      val px = ((z & 0x7fffffff) % w).toInt
      val py = (((z >>> 32) & 0x7fffffff) % h).toInt
      img.setRGB(px, py, 0xffffff ^ img.getRGB(px, py))
      k += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode ALL frames of an animated image with their display offsets
    * (ms). GIF is the one multi-frame container the JDK ships a codec
    * for; per-frame delays come from the GraphicControlExtension
    * (1/100 s units, 100 ms default when absent, matching browsers).
    * Frames are decoded standalone (no disposal compositing — the
    * synthetic fixtures and most screen-capture GIFs write full
    * frames; partial-frame GIFs would need a compositing pass here).
    * A still image comes back as one frame at offset 0.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[(Long, Long, java.awt.image.BufferedImage)] = {
    if (bytes == null) return Seq.empty
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var offset = 0L
          (0 until n).map { i =>
            val img = reader.read(i)
            val delayMs = try {
              val md = reader.getImageMetadata(i)
              val tree = md.getAsTree("javax_imageio_gif_image_1.0")
                .asInstanceOf[org.w3c.dom.Element]
              val gces = tree.getElementsByTagName("GraphicControlExtension")
              if (gces.getLength > 0)
                gces.item(0).asInstanceOf[org.w3c.dom.Element]
                  .getAttribute("delayTime").toLong * 10L
              else 100L
            } catch { case _: Exception => 100L }
            val start = offset
            // browsers render delayTime=0 GIFs at ~100 ms/frame (the
            // legacy screen-capture convention) — match that, not 10 ms
            offset += (if (delayMs <= 0) 100L else math.max(10L, delayMs))
            (start, offset, img)
          }
        } finally reader.dispose()
      } finally iis.close() // the reader does NOT close its input stream
    } catch { case _: Exception => Seq.empty }
  }

  /** Render a deterministic animated GIF: `frames` mosaic frames (one
    * [[renderPng]]-style pattern per frame, seeded by `seed + frame`),
    * each displayed for `delayMs`. The gray mosaic uses ≤ 256 distinct
    * levels, so GIF's palette quantization is LOSSLESS here — a decoded
    * frame is pixel-identical to the equivalent mosaic, which is what
    * lets specs assert frame-exact dHash values.
    */
  def renderGif(seed: Long, frames: Int = 4, w: Int = 32, h: Int = 32,
                delayMs: Int = 500): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until frames) {
        val img = decodeImage(renderPng(seed + f, w, h)).get
        val params = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), params)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
        // default metadata may already carry a GraphicControlExtension —
        // mutate it in place if so (a second one would be ignored by
        // readers); otherwise insert one at its DTD position (after
        // ImageDescriptor / LocalColorTable). Nodes must be
        // IIOMetadataNode instances — the IIOMetadata tree has no owner
        // Document to create elements from.
        val existing = tree.getElementsByTagName("GraphicControlExtension")
        val gce =
          if (existing.getLength > 0) existing.item(0).asInstanceOf[org.w3c.dom.Element]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
            var ref: org.w3c.dom.Node = tree.getFirstChild
            while (ref != null && (ref.getNodeName == "ImageDescriptor" ||
                   ref.getNodeName == "LocalColorTable")) ref = ref.getNextSibling
            tree.insertBefore(n, ref)
            n
          }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", (delayMs / 10).toString)
        gce.setAttribute("transparentColorIndex", "0")
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), params)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  // ===== real audio kernel (javax.sound.sampled — PCM WAV, in the JDK) =====

  /** Decode a 16-bit PCM WAV blob to channel-mixed samples in [-1, 1].
    * `None` for anything the JDK codec can't read or non-16-bit PCM.
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return None
      val data = ais.readAllBytes()
      val ch = fmt.getChannels; val be = fmt.isBigEndian
      val nFrames = data.length / (2 * ch)
      val out = new Array[Float](nFrames)
      var i = 0
      while (i < nFrames) {
        var sum = 0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2
          val s =
            if (be) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
            else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
          sum += s; c += 1
        }
        out(i) = (sum.toFloat / ch) / 32768.0f
        i += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Audio feature vector: RMS energy over `dim` equal sample segments —
    * the standard loudness envelope. Double accumulation, one sqrt per
    * segment: bit-deterministic.
    */
  def audioEnergyProfile(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var s = 0
    while (s < dim) {
      val i0 = (s.toLong * samples.length / dim).toInt
      val i1 = math.max(i0 + 1, ((s + 1).toLong * samples.length / dim).toInt)
      var acc = 0.0; var i = i0
      while (i < math.min(i1, samples.length)) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(s) = math.sqrt(acc / math.max(1, math.min(i1, samples.length) - i0)).toFloat
      s += 1
    }
    out
  }

  /** Audio perceptual signature: 64 bits from the RMS energy envelope —
    * bit b set when segment b is louder than segment b+1 (the dHash
    * difference shape over TIME instead of space; 65 segments → 64
    * comparisons). Invariant to uniform gain, locality-preserving for
    * localized edits: retouching one segment flips at most its two
    * adjacent comparisons.
    */
  def audioSignature64(samples: Array[Float]): Long = {
    val prof = audioEnergyProfile(samples, 65)
    var sig = 0L; var i = 0
    while (i < 64) {
      if (prof(i) > prof(i + 1)) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Near-duplicate audio detection: per-blob envelope signature (real
    * WAV decode, byte-walk fallback for undecodable blobs) through the
    * same Charikar banding the image dHash and text SimHash share.
    */
  def audioNearDups(df: DataFrame, blobCol: String, idCol: String,
                    maxHamming: Int = 4, prefixBits: Int = 8,
                    rotations: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val idIdx = inSchema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      StructField("id", inSchema(idIdx).dataType),
      StructField("sh", LongType, nullable = false)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val sig = decodeWav(bytes) match {
          case Some(samples) => audioSignature64(samples)
          case None          => byteSignature64(bytes)
        }
        Row(r.get(idIdx), sig)
      }
    }
    Dedup.signatureNearDups(spark.createDataFrame(rdd, outSchema),
      maxHamming, prefixBits, rotations)
  }

  /** Deterministic amplitude-MODULATED synthetic WAV: 65 blocks of 100
    * samples, each block a 440 Hz sine at a seeded amplitude in
    * [3000, 12000), plus `noiseSegs` seeded single-block gain changes
    * (×1.5, the "retouched segment" edit). The modulation gives the
    * envelope signature real structure — a constant-amplitude sine has
    * a FLAT envelope whose comparisons are all near-ties. A noised
    * re-render differs in at most 2·noiseSegs signature bits.
    */
  def renderWavMod(seed: Long, noiseSegs: Int = 0): Array[Byte] = {
    val blocks = 65; val per = 100
    val amps = Array.tabulate(blocks) { b =>
      (3000 + (mix64(seed ^ (b.toLong * 0x9e3779b9L)) & 0x7fffffff) % 9000).toInt
    }
    var k = 0
    while (k < noiseSegs) {
      val b = ((mix64(seed * 31 + k + 1) & 0x7fffffff) % blocks).toInt
      amps(b) = math.min(16000, amps(b) * 3 / 2)
      k += 1
    }
    val n = blocks * per
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.sin(2 * math.Pi * 440.0 * i / 8000.0) * amps(i / per)).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Deterministic synthetic 16-bit mono WAV: a seeded sine at 8 kHz.
    * Executor-side fixture generator for the real WAV decode path.
    */
  def renderWav(seed: Long, nSamples: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    val freq = (seed % 17 + 3).toDouble * 55.0
    var i = 0
    while (i < nSamples) {
      val v = (math.sin(2 * math.Pi * freq * i / 8000.0) * 12000).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Magic-number content sniffing — the CHEAP first-pass router for
    * mixed media ingest: pure codegen'd byte comparisons (no codec, no
    * UDF), so a 100 TB blob scan can partition by type BEFORE any
    * expensive try-decode runs. Recognizes the containers the JDK
    * kernels here handle (PNG/JPEG/GIF/WAV) plus ZIP; everything else
    * is `application/octet-stream`. Sniffing is advisory — the decode
    * kernels remain the authority (they tolerate lying extensions and
    * truncated headers by falling back).
    */
  def sniffMediaType(blob: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def magic(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    when(blob.isNull, lit(null).cast("string"))
      .when(substring(blob, 1, 8) === lit(magic(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)),
        lit("image/png"))
      .when(substring(blob, 1, 3) === lit(magic(0xFF, 0xD8, 0xFF)), lit("image/jpeg"))
      .when(substring(blob, 1, 6) === lit("GIF87a".getBytes("US-ASCII")) ||
        substring(blob, 1, 6) === lit("GIF89a".getBytes("US-ASCII")), lit("image/gif"))
      .when(substring(blob, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
        substring(blob, 9, 4) === lit("WAVE".getBytes("US-ASCII")), lit("audio/wav"))
      .when(substring(blob, 1, 4) === lit(magic(0x50, 0x4B, 0x03, 0x04)),
        lit("application/zip"))
      .otherwise(lit("application/octet-stream"))
  }

  // ===== fallback kernel for opaque/corrupt blobs =====

  /** Byte-fold feature for blobs no JDK codec accepts: deterministic
    * xor-fold into a fixed-dim float vector. Kept so unknown media kinds
    * flow through the same pipeline with a usable (if crude) signature
    * instead of failing the job.
    */
  def byteFoldFeature(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    if (bytes == null) return null
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    acc
  }

  /** Back-compat alias for [[byteFoldFeature]] (the round-5 stub name). */
  def stubDecode(bytes: Array[Byte], dim: Int = 8): Array[Float] =
    byteFoldFeature(bytes, dim)

  /** Extract features from a binary media column, partition-wise.
    * Output = input columns (minus the blob) + `featureSchema` fields.
    * Kernel choice per blob: image decode (javax.imageio) → WAV decode
    * (javax.sound) → byte-fold fallback; `media_kind` records which ran.
    */
  def extractFeatures(df: DataFrame, blobCol: String, dim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val keptIdx = inSchema.fields.indices.filter(_ != blobIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields(_)) ++ featureSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init point: ImageIO plugin registry loads once here
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val kept = keptIdx.map(r.get)
        val feats: Seq[Any] =
          if (bytes == null) Seq(null, null, null, null, null, null)
          else {
            val lenSha = Seq[Any](bytes.length.toLong,
              java.lang.Long.toHexString(
                java.util.Arrays.hashCode(bytes).toLong & 0xffffffffL))
            decodeImage(bytes) match {
              case Some(img) =>
                lenSha ++ Seq("image", img.getWidth, img.getHeight,
                  imageFeature(img, dim).toSeq)
              case None => decodeWav(bytes) match {
                case Some(samples) =>
                  lenSha ++ Seq("audio", null, null,
                    audioEnergyProfile(samples, dim).toSeq)
                case None =>
                  lenSha ++ Seq("opaque", null, null,
                    byteFoldFeature(bytes, dim).toSeq)
              }
            }
          }
        Row.fromSeq(kept ++ feats)
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video: every `everyMs`
    * millisecond offsets within [0, durationMs). Pure column expression
    * — the actual frame grab happens inside the decode kernel.
    */
  def frameSampleOffsets(durationMsCol: String, everyMs: Int): org.apache.spark.sql.Column =
    when(col(durationMsCol).isNull || col(durationMsCol) <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), col(durationMsCol) - 1, lit(everyMs.toLong)))

  /** Resize a binary image column partition-wise: decodable images are
    * box-resampled to `width`×`height` and re-encoded PNG
    * ([[resizeImagePng]]); blobs the codec rejects get a deterministic
    * byte-fold of the target pixel budget so the pipeline stays total.
    * Same execution shape as [[extractFeatures]] — per-partition codec
    * init, blob never enters a shuffle key.
    */
  def resize(df: DataFrame, blobCol: String, width: Int, height: Int): DataFrame = {
    val inSchema = df.schema
    val blobIdx = inSchema.fieldIndex(blobCol)
    val outSchema = StructType(inSchema.fields.toSeq ++ Seq(
      StructField("resized_width", IntegerType, nullable = false),
      StructField("resized_height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val vals = r.toSeq.toArray
        val bytes = r.getAs[Array[Byte]](blobIdx)
        vals(blobIdx) = decodeImage(bytes) match {
          case Some(img) => resizeImagePng(img, width, height)
          case None      => byteFoldResize(bytes, width, height)
        }
        Row.fromSeq(vals.toSeq ++ Seq(width, height))
      }
    }(enc)
  }

  /** Fallback resize for non-image blobs: byte-fold to the target pixel
    * budget (deterministic; crude by design).
    */
  def byteFoldResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null) return null
    val out = new Array[Byte](math.max(1, math.min(bytes.length, w * h / 64)))
    var i = 0
    while (i < bytes.length) { out(i % out.length) = (out(i % out.length) ^ bytes(i)).toByte; i += 1 }
    out
  }

  /** Frame sampling: one output row per sampled offset of each video
    * blob — (input columns minus the blob) + `frame_ms` + the frame's
    * feature vector. The frame grab is REAL for multi-frame containers
    * the JDK can decode (animated GIF): the sampled offset selects the
    * frame displayed at that instant (looping past the animation end,
    * as GIFs do) and the feature is that frame's decoded luminance
    * profile. Still images contribute their decoded feature shifted by
    * normalized offset (distinct per sample, deterministic); opaque
    * blobs use the byte-fold. A parent with null/zero duration
    * contributes no frames (inner-explode semantics, like the flatten
    * family). MP4/WebM would need an external codec — the dispatch
    * point is this per-partition kernel, nothing upstream changes.
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
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val dur = if (r.isNullAt(durIdx)) 0L else r.getAs[Number](durIdx).longValue()
        if (bytes == null || dur <= 0) Iterator.empty
        else {
          val kept = keptIdx.map(r.get)
          // decode ONCE per blob, not once per frame
          val frames = decodeFrames(bytes)
          if (frames.size > 1) {
            // REAL multi-frame grab: offset → displayed frame (looping)
            val total = frames.last._2
            val feats = frames.map { case (a, b, img) => (a, b, imageFeature(img, dim)) }
            (0L until dur by everyMs.toLong).iterator.map { ms =>
              val m = ms % total
              val f = feats.find(fr => fr._1 <= m && m < fr._2).getOrElse(feats.last)
              Row.fromSeq(kept ++ Seq(ms, f._3.toSeq))
            }
          } else {
            val base = frames.headOption.map { case (_, _, img) => imageFeature(img, dim) }
              .getOrElse(byteFoldFeature(bytes, dim))
            (0L until dur by everyMs.toLong).iterator.map { ms =>
              val shifted = base.indices.map(i =>
                base(i) + (ms.toFloat / math.max(1L, dur))).toArray
              Row.fromSeq(kept ++ Seq(ms, shifted.toSeq))
            }
          }
        }
      }
    }(enc)
  }

  /** Perceptual 64-bit signature: real dHash for decodable images; for
    * non-image bytes, a deterministic sampled difference walk with the
    * same "few changed bytes → few flipped bits" locality, so mixed
    * corpora still band correctly.
    */
  def perceptualHash64(bytes: Array[Byte]): Long =
    decodeImage(bytes) match {
      case Some(img) => dHash64(img)
      case None      => byteSignature64(bytes)
    }

  /** Fallback signature for non-image blobs: difference walk over 64
    * sampled byte pairs (each byte pair controls at most its own bit).
    */
  def byteSignature64(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.length < 2) return 0L
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      val i = (bit.toLong * (bytes.length - 1) / 64).toInt
      val a = bytes(i) & 0xff
      val b = bytes(math.min(i + 1, bytes.length - 1)) & 0xff
      if (a > b) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Back-compat alias for [[byteSignature64]] (the round-5 stub name). */
  def stubPerceptualHash64(bytes: Array[Byte]): Long = byteSignature64(bytes)

  /** Driver-gate self-check for the media kernels: exercises the REAL
    * codec paths end-to-end on executor-rendered fixtures and returns
    * one `(check_name, ok)` row per invariant. Registered with a
    * literal oracle — a SQL engine can't decode a PNG, but it CAN
    * hash-match our verdicts, which turns this family's correctness row
    * from `no_oracle` into a driver-visible pass/fail.
    *
    * The fixture count is whatever `ids` carries (the gate uses ~50) —
    * bounded by construction, so every aggregate here is a scalar and
    * nothing depends on data scale.
    */
  def selfCheck(ids: DataFrame, idCol: String): DataFrame = {
    val seeds = ids.select(col(idCol).cast("long").as("seed"))
    val render = udf((id: Long) => renderPng(id))

    // 1. every rendered PNG decodes with its true dimensions
    val feats = extractFeatures(
      seeds.withColumn("blob", render(col("seed"))), "blob", dim = 8)
    val decodedAll = feats.agg(
      (count(lit(1)) === count(when(col("media_kind") === "image" &&
        col("width") === 32 && col("height") === 32, 1))).as("ok"))
      .select(lit("decoded_all").as("check_name"), col("ok"))

    // 2. pipeline features equal an independent per-row decode
    val refFeat = udf((id: Long) =>
      decodeImage(renderPng(id)).map(imageFeature(_, 8).toSeq).orNull)
    val featsMatch = feats
      .withColumn("expect", refFeat(col("seed")))
      .agg((count(lit(1)) === count(when(col("feature") === col("expect"), 1))).as("ok"))
      .select(lit("features_match").as("check_name"), col("ok"))

    // 3. dHash locality: a 2-pixel-noised re-render stays within 8 bits,
    //    an unrelated seed's mosaic lands far away (expected ~32 bits)
    val hammings = udf { (id: Long) =>
      val h0 = dHash64(decodeImage(renderPng(id)).get)
      val hn = dHash64(decodeImage(renderPng(id, noisePixels = 2)).get)
      val hf = dHash64(decodeImage(renderPng(id + 999999L)).get)
      Seq(java.lang.Long.bitCount(h0 ^ hn), java.lang.Long.bitCount(h0 ^ hf))
    }
    val dhashLocal = seeds.select(hammings(col("seed")).as("hs"))
      .agg((max(element_at(col("hs"), 1)) <= 8 &&
        min(element_at(col("hs"), 2)) > 8).as("ok"))
      .select(lit("dhash_locality").as("check_name"), col("ok"))

    // 4. resize pipeline emits decodable PNGs at the target raster
    val dims = udf((b: Array[Byte]) =>
      decodeImage(b).map(i => Seq(i.getWidth, i.getHeight)).orNull)
    val resized = resize(
      seeds.withColumn("blob", render(col("seed"))), "blob", 16, 16)
    val resizeOk = resized.select(dims(col("blob")).as("wh"))
      .agg((count(lit(1)) === count(when(
        element_at(col("wh"), 1) === 16 && element_at(col("wh"), 2) === 16, 1))).as("ok"))
      .select(lit("resize_roundtrip").as("check_name"), col("ok"))

    // 5. WAV decode: sample count exact, RMS envelope of a constant-
    //    amplitude sine within 2% of amp/sqrt(2)
    val wavOk = udf { (id: Long) =>
      decodeWav(renderWav(id)) match {
        case Some(samples) if samples.length == 8000 =>
          val expect = 12000f / 32768f / math.sqrt(2).toFloat
          audioEnergyProfile(samples, 4).forall(p => math.abs(p - expect) < 0.02f)
        case _ => false
      }
    }
    val wavCheck = seeds.select(wavOk(col("seed")).as("o"))
      .agg((count(lit(1)) === count(when(col("o"), 1))).as("ok"))
      .select(lit("wav_decode").as("check_name"), col("ok"))

    // 6. perceptual near-dup banding finds exactly the planted noised
    //    twins over the real dHash signatures
    val renderNoisy = udf((id: Long) => renderPng(id, noisePixels = 2))
    val baseImgs = seeds.select(col("seed").as("mid"), render(col("seed")).as("blob"))
    val twins = seeds.filter(col("seed") % 7 === 0)
      .select((col("seed") + 1000000L).as("mid"), renderNoisy(col("seed")).as("blob"))
    // lazy planted count: an eager .count() here would run a job at
    // frame-construction time (plan-only sweeps included) — ride it in
    // as a broadcast 1-row frame instead
    val plantedDf = seeds.filter(col("seed") % 7 === 0)
      .agg(count(lit(1)).as("planted"))
    // rotations=8 × prefixBits=8 = the pigeonhole-exact regime: every
    // pair within hamming 4 is GUARANTEED found, so the verdict can't
    // flake on banding luck (2 noise pixels flip ≤ 2 dHash cells ≤ 4 bits)
    val pairs = imageNearDups(baseImgs.unionByName(twins), "blob", "mid",
      maxHamming = 4, prefixBits = 8, rotations = 8)
    val neardupOk = pairs.crossJoin(broadcast(plantedDf))
      // empty pair set ⇒ the crossJoin is empty and min(planted) is
      // null — coalesce pins the verdict to an explicit false
      .agg(coalesce(count(lit(1)) === min(col("planted")) &&
        count(when(col("id_b") - col("id_a") === 1000000L &&
          col("id_a") % 7 === 0, 1)) === min(col("planted")), lit(false)).as("ok"))
      .select(lit("neardup_planted_twins").as("check_name"), col("ok"))

    // 7. animated-GIF frame decode: 4 frames at their declared offsets,
    //    each pixel-faithful to its source mosaic (gray ≤256 levels ⇒
    //    palette quantization is lossless ⇒ dHash matches exactly)
    val gifOk = udf { (id: Long) =>
      val frames = decodeFrames(renderGif(id, frames = 4, delayMs = 500))
      frames.size == 4 &&
        frames.map(f => (f._1, f._2)) == Seq((0L, 500L), (500L, 1000L),
          (1000L, 1500L), (1500L, 2000L)) &&
        frames.zipWithIndex.forall { case ((_, _, img), f) =>
          dHash64(img) == dHash64(decodeImage(renderPng(id + f)).get)
        }
    }
    val gifCheck = seeds.select(gifOk(col("seed")).as("o"))
      .agg((count(lit(1)) === count(when(col("o"), 1))).as("ok"))
      .select(lit("gif_frames_real").as("check_name"), col("ok"))

    decodedAll.unionByName(featsMatch).unionByName(dhashLocal)
      .unionByName(resizeOk).unionByName(wavCheck).unionByName(neardupOk)
      .unionByName(gifCheck)
      .orderBy("check_name")
  }

  /** Near-duplicate media detection: per-blob perceptual signature
    * (partition-wise map, real dHash for images), then the SAME Charikar
    * rotation-banded hamming pair generation the text SimHash uses
    * ([[Dedup.signatureNearDups]]) — banding, bucket join, and popcount
    * verify are shared and spec-exact.
    */
  def imageNearDups(df: DataFrame, blobCol: String, idCol: String,
                    maxHamming: Int = 6, prefixBits: Int = 12,
                    rotations: Int = 4): DataFrame = {
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
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          Row(r.get(idIdx), perceptualHash64(r.getAs[Array[Byte]](blobIdx)))
        }
      }
      spark.createDataFrame(rdd, outSchema)
    }
    Dedup.signatureNearDups(sigs, maxHamming, prefixBits, rotations)
  }
}
