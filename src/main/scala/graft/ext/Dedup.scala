package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB of documents):
  *   - exact dedup is a hash-groupBy — one shuffle on a 64-bit key;
  *   - MinHash/LSH avoids the O(n²) pair space by banding signatures and
  *     joining only within buckets (shuffle on band-hash, then verify);
  *   - pairwise Jaccard/cosine paths are for *candidate verification*
  *     (post-LSH) or bounded scopes — never run them unbucketed at scale.
  */
object Dedup {

  /** Exact dedup: keep one representative (min id) per normalized-text
    * fingerprint. One full-row shuffle on the 64-bit fingerprint plus a
    * per-partition sort (window form — no partial aggregation; the
    * groupBy-keepers + join alternative trades the sort for a second
    * small (fp,id) shuffle and benchmarked equivalently at 2M rows).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(Window.partitionBy(col("__fp"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__fp", "__keep")

  /** Exact dedup keeping the duplicate that MAXIMIZES `preferCol` per
    * normalized-text fingerprint (quality-first representative
    * selection — training pipelines keep the longest / highest-quality
    * copy, not an arbitrary one). Ties break to min id for
    * determinism. Same single-shuffle profile as [[exact]].
    */
  def exactKeepBest(docs: DataFrame, textCol: String, idCol: String,
                    preferCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp"))
      .orderBy(col(preferCol).desc_nulls_last, col(idCol).asc)
    docs
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  // ---- MinHash ----

  /** k independent MinHash values over a shingle array (Broder '97).
    * Each shingle is string-hashed ONCE (xxhash64); the k "hash
    * functions" are cheap odd-multiplier permutations of that 64-bit
    * value (x ↦ a·x + b mod 2⁶⁴ — a bijection for odd a), so cost is
    * |shingles| string hashes + k·|shingles| long ops instead of
    * k·|shingles| string hashes. Measured 131s → 26s on 510k docs.
    * Pure column expressions; one pass, no shuffle.
    */
  /** deterministic odd multiplier + offset for hash function i
    * (odd-a wraparound multiply mod 2⁶⁴ is a bijection). `a` is kept
    * below 2³¹ so an oracle engine with 128-bit ints can replicate
    * a·x + b mod 2⁶⁴ in one multiply (2³¹·2⁶⁴ < 2¹²⁷); the input is
    * already a well-mixed 64-bit FNV hash so a small odd multiplier
    * loses no minhash quality.
    */
  private[graft] def permuteConsts(seed: Int): (Long, Long) = (
    2 * ((0x9E3779B97F4A7C15L * (seed + 1) ^ (seed * 0xC2B2AE3D27D4EB4FL)) & 0x3FFFFFFFL) + 1,
    0x165667B19E3779F9L * (seed + 13))

  def minhashSignature(shingles: Column, k: Int): Column = {
    val baseHashes = transform(shingles, s => graft.functions.VectorExpressions.fnv1a64(s))
    array((0 until k).map { seed =>
      val (a, b) = permuteConsts(seed)
      array_min(transform(baseHashes,
        h => graft.functions.VectorExpressions.hashPermute(h, a, b)))
    }: _*)
  }

  /** Signature computation shaped for scale: explode shingles → ONE
    * codegen'd xxhash64 per shingle → groupBy(doc) with k min()
    * aggregates of cheap wraparound permutations. The array-expression
    * form above goes through interpreted higher-order functions
    * (transform/array_min are not codegen'd) and is ~5× slower at
    * corpus scale; this form is all whole-stage codegen with map-side
    * partial mins. Returns (id, sig: array<bigint>[k]).
    */
  def minhashSignatureDf(docs: DataFrame, textCol: String, idCol: String,
                         shingleSize: Int, k: Int): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("id"),
        explode(TextOps.shingleHashes(col(textCol), shingleSize)).as("h"))
    val minCols = (0 until k).map { seed =>
      val (a, b) = permuteConsts(seed)
      min(graft.functions.VectorExpressions.hashPermute(col("h"), a, b)).as(s"m$seed")
    }
    hashed.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split a k-length signature into `bands` bands of
    * `k/bands` rows each, hash each band → (bandIdx, bandHash) array.
    * Docs sharing ANY band bucket become candidate pairs.
    */
  def lshBands(signature: Column, k: Int, bands: Int): Column = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, s"bands ($bands) must divide k ($k)")
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        graft.functions.VectorExpressions.fnv1a64(concat_ws(",", lit(b),
          slice(signature, b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
    }: _*)
  }

  /** MinHash+LSH near-duplicate pairs: shingle → sign → band → explode →
    * self-join on (band, bucket) → verify estimated Jaccard from the full
    * signatures. Returns (idA, idB, est_jaccard) with idA < idB.
    *
    * Shuffle profile: one shuffle on band-bucket (the join), candidate
    * set ≪ n²; the verify step is a map over joined rows. At 100 TB,
    * tune `bands`/`k` for the target threshold (threshold ≈
    * (1/bands)^(1/rowsPerBand)) so buckets stay small.
    *
    * `maxBucketSize`: a (band, bucket) holding m docs contributes
    * O(m²) candidate pairs; boilerplate corpora (license headers,
    * templated pages) produce a few huge buckets that dominate the join
    * (the skew failure mode SCALE.md names). With the cap on, buckets
    * larger than `maxBucketSize` are dropped BEFORE the self-join —
    * near-identical docs in a dropped bucket still pair through their
    * other `bands - 1` buckets, so recall for true near-dups degrades
    * gracefully while the worst-case candidate count becomes
    * Σ min(|bucket|, cap)².
    */
  def minhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Option[Int] = None): DataFrame = {
    val signed = minhashSignatureDf(docs, textCol, idCol, shingleSize, k)
    val banded0 = signed
      .select(col("id"), col("sig"), explode(lshBands(col("sig"), k, bands)).as("b"))
      .select(col("id"), col("sig"), col("b.band"), col("b.bucket"))
    val banded = maxBucketSize match {
      case None => banded0
      case Some(cap) =>
        val hot = banded0.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > cap)
          .select(col("band"), col("bucket"))
        banded0.join(hot, Seq("band", "bucket"), "left_anti")
    }
    val a = banded.as("a")
    val b = banded.as("b")
    // est_jaccard is identical for duplicate pair rows (same signatures),
    // so verify + filter BEFORE the pair dedup: the dedup shuffle then
    // carries only the (tiny) surviving pair set, not every candidate
    // with two full k-long signatures
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), m => m))
          .cast(DoubleType) / lit(k.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact incremental dedup: incoming docs whose normalized-text
    * fingerprint already exists in the corpus store are dropped. The
    * store side only needs the 64-bit fingerprint column (persist it
    * once; 8 bytes/doc), the incoming batch never joins the corpus
    * text. One broadcast-or-shuffle anti-join on the fingerprint.
    */
  def exactAgainstStore(incoming: DataFrame, textCol: String,
                        storeFingerprints: DataFrame): DataFrame = {
    val fpCol = storeFingerprints.columns(0)
    incoming
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .join(storeFingerprints.select(col(fpCol).as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Incremental MinHash+LSH near-dedup: candidate pairs between an
    * INCOMING batch and an existing CORPUS STORE — the daily-ingest
    * shape, where re-self-joining the whole corpus per batch would be
    * absurd. Both sides are banded identically and joined on
    * (band, bucket): cost is O(|incoming| signatures) map work + a
    * join against the store's banded signatures, which at scale are
    * PRECOMPUTED once ([[minhashSignatureDf]] output persisted,
    * partitioned by band) and only grow by each accepted batch.
    * Returns (id_new, id_store, est_jaccard).
    *
    * `maxBucketSize` caps STORE-side buckets (boilerplate hot buckets
    * live in the corpus; see [[minhashNearDups]] for the recall
    * trade-off).
    */
  def minhashNearDupsAgainst(
      incoming: DataFrame, store: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Option[Int] = None): DataFrame =
    minhashNearDupsAgainstBanded(
      bandedSignatures(incoming, textCol, idCol, shingleSize, k, bands),
      bandedSignatures(store, textCol, idCol, shingleSize, k, bands),
      k, threshold, maxBucketSize)

  /** Banded MinHash signatures — (id, sig, band, bucket), one row per
    * band. This is the PERSISTABLE store-side artifact of incremental
    * dedup: write it once (partitioned by band if large), append each
    * accepted batch's rows, and per-batch cost drops to signing the
    * batch + one join — the store text is never re-shingled. (Soak:
    * 10k-vs-510k went 45 s → 5.5 s once the store side was persisted.)
    */
  def bandedSignatures(docs: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int = 3, k: Int = 64,
                       bands: Int = 16): DataFrame =
    minhashSignatureDf(docs, textCol, idCol, shingleSize, k)
      .select(col("id"), col("sig"), explode(lshBands(col("sig"), k, bands)).as("b"))
      .select(col("id"), col("sig"), col("b.band"), col("b.bucket"))

  /** The join half of [[minhashNearDupsAgainst]], taking pre-banded
    * frames (from [[bandedSignatures]], live or read back from a
    * persisted store).
    */
  def minhashNearDupsAgainstBanded(
      incomingBanded: DataFrame, storeBanded: DataFrame, k: Int,
      threshold: Double, maxBucketSize: Option[Int] = None): DataFrame = {
    val bSt = maxBucketSize match {
      case None => storeBanded
      case Some(cap) =>
        val hot = storeBanded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > cap)
          .select(col("band"), col("bucket"))
        storeBanded.join(hot, Seq("band", "bucket"), "left_anti")
    }
    incomingBanded.as("a").join(bSt.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_new"), col("b.id").as("id_store"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), m => m))
          .cast(DoubleType) / lit(k.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_new", "id_store")
  }

  // ---- SimHash ----

  /** 64-bit SimHash per doc: per-bit weighted vote of shingle hashes,
    * bit set iff the vote sum is positive. Shaped for scale: explode
    * shingles → one xxhash64 per shingle → ONE groupBy(id) with 64
    * conditional sums (map-side partial aggregation; a single shuffle on
    * the doc id). The naive formulation — 64 `aggregate` lambdas over
    * the shingle array per row — blows up codegen and ran 35s at sf0.1
    * vs <2s for this shape.
    * Returns (idCol, simhash: long).
    */
  def simhashDf(docs: DataFrame, textCol: String, idCol: String,
                shingleSize: Int): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("id"),
        explode(TextOps.shingleHashes(col(textCol), shingleSize)).as("h"))
    val voteCols = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"v$bit")
    }
    val votes = hashed.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
    val sh = (0 until 64).map { bit =>
      when(col(s"v$bit") > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("id"), sh.as("sh"))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `maxHamming`, block-permutation
    * bucketed: each doc is bucketed on the top `prefixBits` bits of
    * `rotations` rotations of its hash, and candidates sharing ANY
    * rotated bucket are verified. With rotations=r, a pair is missed
    * only if every rotation puts a differing bit in the prefix — for
    * hamming ≤ d pairs the miss probability shrinks geometrically with
    * r (the classic Charikar/Manku block-permutation scheme).
    * rotations=1 is the cheap prefix-only variant.
    *
    * FULL-RECALL configuration: when `prefixBits == 64/rotations` the
    * rotated prefixes are exactly `rotations` disjoint aligned blocks
    * covering all 64 bits, so by pigeonhole any pair with
    * `hamming < rotations` shares at least one clean block and is
    * GUARANTEED to be found (e.g. rotations=8, prefixBits=8 is exact
    * for maxHamming ≤ 7) — which is what lets the DuckDB oracle check
    * this operator against brute-force all-pairs hamming.
    */
  def simhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, maxHamming: Int = 3,
      prefixBits: Int = 16, rotations: Int = 4): DataFrame =
    signatureNearDups(simhashDf(docs, textCol, idCol, shingleSize),
      maxHamming, prefixBits, rotations)

  /** Hamming-banded pair generation over ANY 64-bit signature frame
    * (`id`, `sh`) — the Charikar/Manku block-permutation core factored
    * out of [[simhashNearDups]] so other signature families (perceptual
    * image hashes, audio fingerprints) reuse the same bucketing: rotate
    * the signature `rotations` ways, bucket each rotation by its top
    * `prefixBits`, generate candidates only within buckets, verify with
    * the exact popcount.
    */
  def signatureNearDups(
      sigs: DataFrame, maxHamming: Int = 3,
      prefixBits: Int = 16, rotations: Int = 4): DataFrame = {
    val step = 64 / rotations
    val rot = explode(array((0 until rotations).map { r =>
      val k = r * step
      val rotated =
        if (k == 0) col("sh")
        else shiftleft(col("sh"), k).bitwiseOR(shiftrightunsigned(col("sh"), 64 - k))
      struct(lit(r).as("r"), shiftrightunsigned(rotated, 64 - prefixBits).as("b"))
    }: _*))
    val bucketed = sigs.select(col("id"), col("sh"), rot.as("rb"))
      .select(col("id"), col("sh"), col("rb.r").as("r"), col("rb.b").as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    // hamming is identical for duplicate pair rows — filter before the
    // pair dedup so only near-dups shuffle (same reshape as minhash)
    a.join(b, col("a.r") === col("b.r") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS local-fingerprinting algorithm): hash every k-word
    * shingle, then in each window of `window` consecutive shingle
    * hashes keep the MINIMUM (rightmost position on ties). The
    * guarantee whole-document hashing can't give: any shared run of at
    * least `window + shingleSize - 1` words produces at least one
    * SHARED fingerprint, so partial plagiarism/quotation is detectable
    * by a plain equi-join on `fp` (inverted-index shape, like
    * [[jaccardPairs]]) — no pair space, no all-pairs scan.
    *
    * Scale shape: one explode to (doc, pos, hash), two window
    * functions over the doc partition (no shuffle beyond the one
    * partitioning), one distinct. Document length bounds the partition,
    * not corpus size.
    *
    * Output: (id, fp_pos, fp) — selected fingerprints with the shingle
    * position they cover. Documents with fewer than `window` shingles
    * contribute their single global minimum (the whole doc is one
    * window).
    */
  def winnowingFingerprints(docs: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, window: Int = 4): DataFrame = {
    require(window >= 1, "winnowingFingerprints: window must be >= 1")
    val sh = docs.select(col(idCol).as("id"),
      posexplode(TextOps.shingleHashes(col(textCol), shingleSize)).as(Seq("pos", "h")))
    val frame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    val whole = Window.partitionBy(col("id"))
    sh
      // struct min = (hash asc, -pos asc) → smallest hash, rightmost tie
      .withColumn("sel", min(struct(col("h"), (-col("pos")).as("np"))).over(frame))
      .withColumn("cnt", count(lit(1)).over(frame))
      .withColumn("n", count(lit(1)).over(whole))
      // a start row defines a window only when `window` shingles exist
      // from it; shorter docs keep their one whole-doc window at pos 0
      .filter(col("cnt") === window || (col("n") < window && col("pos") === 0))
      .select(col("id"), (-col("sel.np")).as("fp_pos"), col("sel.h").as("fp"))
      .distinct()
  }

  /** Document pairs sharing at least `minShared` winnowing
    * fingerprints — the partial-copy/quotation detector built on
    * [[winnowingFingerprints]]. Inverted-index shape: the equi-join on
    * `fp` IS the candidate filter (shuffle on fingerprint, never the
    * pair space), with the same hot-key degeneracy cap the other
    * index joins carry (`maxFpDf` drops boilerplate fingerprints
    * appearing in more docs than the cap before the join fans out).
    */
  def winnowingOverlapPairs(docs: DataFrame, textCol: String, idCol: String,
                            shingleSize: Int = 3, window: Int = 4,
                            minShared: Int = 2,
                            maxFpDf: Option[Int] = None): DataFrame = {
    val fps = winnowingFingerprints(docs, textCol, idCol, shingleSize, window)
      .select(col("id"), col("fp")).distinct()
    val inv = maxFpDf match {
      case None => fps
      case Some(cap) =>
        val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("fp"))
        fps.join(hot, Seq("fp"), "left_anti")
    }
    inv.as("a")
      .join(inv.as("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // ---- exact-verified n-gram Jaccard ----

  /** True Jaccard similarity between the distinct word-shingle sets of
    * doc pairs that share ≥1 shingle. The shared-shingle inner join IS
    * the candidate filter (inverted-index pattern): shuffle on shingle,
    * never on the pair space. Bound the scope (or run post-LSH) at scale;
    * hot shingles (stop-phrases) should be dropped via a doc-frequency
    * cap upstream.
    */
  def jaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Option[Int] = None): DataFrame = {
    // shingles live as 64-bit FNV hashes end-to-end (single-pass
    // kernel; the inverted index and intersection counts only need
    // equality, and 8-byte keys shuffle ~4× lighter than shingle text)
    val sh = docs.select(
        col(idCol).as("id"),
        array_distinct(TextOps.shingleHashes(col(textCol), shingleSize)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val inverted0 = sh.select(col("id"), explode(col("shingles")).as("sh"))
    // hot-shingle cap: drop shingles appearing in more than maxShingleDf
    // docs (stop-phrases) BEFORE the pair join — they contribute huge
    // candidate fan-out but little discriminating signal. NOTE: with the
    // cap on, `jaccard` is computed over capped shingle sets (a lower
    // bound on true jaccard for affected pairs) — standard practice for
    // web-scale dedup.
    val inverted = maxShingleDf match {
      case None => inverted0
      case Some(cap) =>
        val hot = inverted0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("sh"))
        inverted0.join(hot, Seq("sh"), "left_anti")
    }
    // sizes over the (possibly capped) shingle space, so jaccard stays
    // internally consistent: |A∩B| / (|A|+|B|-|A∩B|) in the same space
    val sizes = inverted.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val pairs = inverted.as("a")
      .join(inverted.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count("*").as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-document duplicate-passage profile (the Lee et al. 2022
    * "Deduplicating Training Data" motif at window granularity): for
    * each document, how many of its n-token windows also occur in at
    * least one OTHER document, and the duplicated-window fraction. High
    * fractions flag boilerplate-heavy docs (licenses, navboxes,
    * templated pages) that survive whole-document dedup because the
    * surrounding text differs.
    *
    * Shape: windows live as 64-bit FNV shingle hashes (single-pass
    * kernel) → a distinct-(doc, window) pass builds the document-
    * frequency table keyed by window hash → windows re-join their df
    * and aggregate per doc. Both shuffles are keyed by window hash or
    * doc id and sized by the token stream — the pair space is never
    * materialized, so the profile runs at corpus scale where a
    * passage-level self-join cannot. Docs with fewer than n tokens come
    * out with zero windows and a null fraction.
    */
  def duplicatePassages(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 5): DataFrame = {
    val windows = docs.select(col(idCol).as("id"),
      explode(TextOps.shingleHashes(col(textCol), n)).as("h"))
    val docFreq = windows.distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__ndocs"))
    val perDoc = windows.join(docFreq, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__ndocs") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_windows"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(col("n_dup_windows").cast(DoubleType)
          / col("n_windows").cast(DoubleType), 6).as("dup_frac"))
  }

  /** The duplicate-passage TREATMENT (Lee et al. 2022 §4: drop the
    * duplicated span, keep the rest): rewrite each document with every
    * token removed that lies inside an n-token window occurring in at
    * least `minDf` distinct documents. Whole-doc dedup misses these —
    * the boilerplate block survives inside otherwise-unique pages;
    * this removes the block itself.
    *
    * Scale shape — everything is explode + join + re-aggregate, no
    * per-row quadratic HOFs: tokens and windows posexplode with their
    * positions; dup windows (df ≥ minDf over window hashes) semi-join
    * back and fan out to their covered positions; surviving tokens
    * anti-join and re-assemble in position order. Shuffles are keyed by
    * window hash or doc id and sized by the token stream. Whitespace is
    * normalized to single spaces in the rewrite (tokenization is the
    * unit of surgery); case is preserved.
    */
  def removeDuplicatePassages(docs: DataFrame, textCol: String, idCol: String,
                              n: Int = 5, minDf: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
    val toks = base
      .select(col("id"), posexplode(split(trim(col("__text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val wins = base.select(col("id"),
      posexplode(TextOps.shingleHashes(col("__text"), n)).as(Seq("wpos", "h")))
    val dupH = wins.select(col("id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf).select(col("h"))
    val covered = wins.join(dupH, Seq("h"), "left_semi")
      .select(col("id"),
        explode(sequence(col("wpos"), col("wpos") + lit(n - 1))).as("pos"))
      .distinct()
    val rebuilt = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept_tokens"))
    base.select(col("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"))
  }

  /** The persistable corpus-side state for cross-run passage profiling:
    * one row per distinct n-token window hash with its document
    * frequency. Write it partitioned however the warehouse likes and
    * hand it back to [[duplicatePassagesAgainst]] per ingest batch —
    * the corpus is then never re-scanned (same pattern as
    * [[bandedSignatures]] for LSH dedup).
    */
  def windowStore(docs: DataFrame, textCol: String, idCol: String,
                  n: Int = 5): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.shingleHashes(col(textCol), n)).as("h"))
      .distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))

  /** Incremental duplicate-passage profile: an incoming batch scored
    * against a persisted [[windowStore]] — a batch window counts as
    * duplicated if its hash exists in the store (any corpus doc has it)
    * OR occurs in another batch document. The daily-ingest shape:
    * store-side cost is one join keyed by window hash against the
    * (distinct-window-sized) store, the batch is the only text scanned.
    * `n` must match the store's.
    */
  def duplicatePassagesAgainst(batch: DataFrame, store: DataFrame,
                               textCol: String, idCol: String,
                               n: Int = 5): DataFrame = {
    val windows = batch.select(col(idCol).as("id"),
      explode(TextOps.shingleHashes(col(textCol), n)).as("h"))
    val batchDf = windows.distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__bdocs"))
    val flagged = windows
      .join(batchDf, Seq("h"))
      .join(store.select(col("h"), col("n_docs").as("__sdocs")), Seq("h"), "left")
      .withColumn("__dup",
        when(col("__sdocs").isNotNull || col("__bdocs") > 1, 1L).otherwise(0L))
    val perDoc = flagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"), sum(col("__dup")).as("n_dup_windows"))
    batch.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(col("n_dup_windows").cast(DoubleType)
          / col("n_windows").cast(DoubleType), 6).as("dup_frac"))
  }

  // ---- cluster resolution ----

  /** Connected components over a near-dup pair graph: every node gets
    * `cluster_id` = the minimum node id reachable from it. This is the
    * step that turns PAIRS (what LSH/jaccard emit) into deduplicatable
    * CLUSTERS — without it, transitive groups (A~B, B~C but A≁C) can't
    * be reduced to one representative.
    *
    * Algorithm: iterative min-label propagation. Each round, every node
    * takes the min of its own label and its neighbors' labels; converged
    * when no label changes. Rounds = component diameter, and near-dup
    * graphs have tiny, dense components (bucket caps bound them by
    * construction — see [[minhashNearDups]] `maxBucketSize`), so this
    * terminates in a handful of rounds even at corpus scale. Each round
    * is one shuffle of the (node, label) frame on node id + one
    * broadcast-or-shuffle join with the edge list; `localCheckpoint`
    * cuts the growing lineage so round N doesn't recompute rounds 1..N-1.
    *
    * `edges` is (id_a, id_b) — undirected, either orientation; `nodes`
    * is one column `id` (singletons come out labeled with themselves).
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIterations: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    // localCheckpoint pins blocks on EXECUTORS only — fast, and right
    // for local mode, but on a real cluster a single executor loss
    // makes the pinned frame unrecoverable and fails the whole dedup
    // job. Pass checkpointDir (HDFS/object-store path) to switch every
    // per-round pin to a reliable checkpoint that survives executor
    // loss at the cost of a write per round.
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    val pin: DataFrame => DataFrame =
      if (checkpointDir.isDefined) _.checkpoint(true) else _.localCheckpoint(true)
    // pin the edge list too: its lineage is the whole upstream pair
    // generation (LSH banding / shingle explode — the expensive part),
    // and it is re-joined EVERY round plus once per convergence check;
    // unpinned, a 4-round graph recomputes pair generation ~8 times.
    // r18: pin adj PARTITIONED BY src and labels BY id —
    // Dataset.checkpoint preserves the partitioning in the pinned
    // LogicalRDD, so every round's adj⋈labels and labels⟕nbrMin joins
    // reuse it instead of re-shuffling both sides each round
    // (guide §2.4: establish the partitioning once).
    val adj = pin(edges
      .select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .union(edges.select(col(edges.columns(1)).as("src"), col(edges.columns(0)).as("dst")))
      .repartition(col("src")))
    var labels = pin(nodes.select(col(nodes.columns(0)).as("id"))
      .withColumn("lbl", col("id"))
      .repartition(col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      val nbrMin = adj.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("nlbl"))
      // carry the previous label through the pin: the convergence check
      // is then a filter over the pinned frame instead of a second
      // labels join per round (one fewer shuffle join per iteration)
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          col("lbl").as("prev"))
      // r18 pointer-jump compression: follow the label ONE more hop
      // through the just-computed round (lbl ← lbl(lbl)) so label
      // chains collapse doubly per round — rounds drop from
      // O(component diameter) to ~O(log diameter) (measured: a
      // diameter-48 chain converges in 6 rounds, x_er_cluster 10 → 7
      // at sf0.1 — deep graphs are where the 100× soak measured 14
      // rounds). `prop` stays LAZY: the self-join's two sides are the
      // identical subtree, so they collapse to one ReusedExchange —
      // the jump costs one extra exchange per round, not an extra
      // materialization job. Labels are always node ids (init = id,
      // min over neighbor labels), so the lookup hits; monotone
      // decrease is preserved, therefore the fixed point — and the
      // early-exit argument — are unchanged: a round that propagates
      // nothing also jumps nothing.
      val next = pin(prop.as("a")
        .join(prop.select(col("id").as("__l"), col("lbl").as("__l2")).as("b"),
          col("a.lbl") === col("b.__l"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("b.__l2"), col("a.lbl")).as("lbl"),
          col("a.prev").as("prev")))
      converged = next.filter(col("lbl") < col("prev")).isEmpty
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    // an unconverged result is WRONG (intermediate labels would split a
    // real cluster into several "representatives") — fail loudly rather
    // than return it; near-dup graphs converge in a handful of rounds,
    // so hitting this means the graph has chains far beyond what the
    // bucket caps should allow and maxIterations needs an explicit bump
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIterations rounds " +
          "(component diameter exceeds maxIterations); raise maxIterations")
    // one line per invocation: the round count is the scale-health
    // signal (it tracks component diameter, which bucket caps bound) —
    // a soak that converges in 3 rounds at 1x and 12 at 100x is telling
    // you the corruption density changed the graph shape
    System.err.println(s"[graft] connectedComponents converged in $iter rounds")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** One representative per near-dup cluster: resolve components over
    * the pair graph, keep the min-id doc of each cluster (singletons —
    * docs in no pair — always survive). The end-to-end near-dedup:
    * `docs → pairs (minhash/jaccard/embedding) → keepClusterRepresentatives`.
    */
  def keepClusterRepresentatives(docs: DataFrame, pairs: DataFrame,
                                 idCol: String,
                                 checkpointDir: Option[String] = None): DataFrame = {
    val cc = connectedComponents(
      pairs.select(col(pairs.columns(0)), col(pairs.columns(1))),
      docs.select(col(idCol)), checkpointDir = checkpointDir)
    // reserved alias: an unqualified "id" would be ambiguous whenever
    // docs itself carries an `id` column (e.g. idCol = "id")
    val reps = cc.filter(col("id") === col("cluster_id"))
      .select(col("id").as("__rep_id"))
    docs.join(reps, docs(idCol) === reps("__rep_id"), "left_semi")
  }

  /** Embedding-cosine near-duplicate pairs, EXACT all-pairs form.
    * O(n²) pair space — this is the *verification oracle / bounded-scope*
    * path only (tests, post-bucketing audit of a sample). At corpus
    * scale use [[embeddingNearDupsBucketed]].
    */
  def embeddingNearDups(
      embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", graft.functions.VectorExpressions.cosineF(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-dups at scale: IVF cell-bucketed pair
    * generation instead of the all-pairs join. Each vector is assigned
    * to its `nProbe` nearest coarse centroids (multi-probe assignment —
    * the standard recall fix for pairs straddling a cell boundary);
    * candidate pairs are generated only *within* a cell, then verified
    * with the exact codegen'd cosine kernel.
    *
    * Shuffle profile: centroids are broadcast (tiny); the corpus
    * shuffles ONCE on `cell` for the self-join; pair space is
    * Σ_cells |cell|² instead of n². Size `nCells` ≈ n / targetCellSize
    * (e.g. 1M vectors / 1k-per-cell = 1024 cells) so per-cell pair
    * blocks stay bounded; recall for true near-dups (cos ≥ ~0.9) is
    * high because near-identical vectors share a nearest centroid, and
    * multi-probe covers boundary pairs (DedupSpec measures it against
    * the exact pairs).
    */
  /** Cross-run embedding near-dedup: an incoming batch probed against
    * the existing corpus — the embedding-space twin of
    * [[minhashNearDupsAgainst]], completing the incremental story for
    * every dedup family. The store keeps its IVF layout (top-1 cell per
    * vector — what [[Similarity.writeAssigned]] persists partitioned by
    * cell); the batch multi-probes its `nProbe` nearest cells, and only
    * (batch × same-cell store) candidates are cosine-verified — no
    * store self-join, no cartesian. Approximate like the bucketed
    * variant: verification is exact, bucketing can only miss.
    */
  /** Top-`nProbe` cell multi-probe as ONE narrow kernel row-expansion
    * over a frame with a `v` vector column: every input column is kept
    * and each row fans out to its nProbe probed cells.
    * [[graft.functions.VectorExpressions.nearestCellsTopK]] against
    * the flat driver-normalized centroid matrix ranks by dot/‖centroid‖
    * — ranking-equivalent to the cosine the replaced form computed
    * (1/‖v‖ is a positive per-row constant), ties to the lower cell;
    * NaN-scored cells are skipped (kernel contract), where the window
    * form ranked them first — NaN/Inf inputs only. Replaces a
    * crossJoin+rank-window that materialized and SHUFFLED n×nCells
    * rows per probe selection: at a 4096-cell index over a 100 TB
    * corpus that was the same n×nCells blowup the r13 kernels removed
    * from IVF assignment and query-probe selection.
    */
  private def multiProbe(e: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    val (units, cellIds, dim) = Similarity.flatCentroids(cents, normalize = true)
    val keep = e.columns.map(col).toIndexedSeq :+ col("pc.cell").as("cell")
    e.withColumn("pc", explode(graft.functions.VectorExpressions.nearestCellsTopK(
        col("v"), units, cellIds, dim, nProbe)))
      .select(keep: _*)
  }

  def embeddingNearDupsAgainst(
      incoming: DataFrame, store: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nCells: Int = 16, nProbe: Int = 2,
      lloydIterations: Int = 1,
      useFused: Option[Boolean] = None): DataFrame = {
    val st = store.select(col(idCol).as("id"), col(vecCol).as("v"))
    // WithStats: the refinement's per-cell counts feed the fused
    // operator's skew-salt detection for free (default-on — a
    // degenerate centroid set over the store no longer serializes the
    // partitioned mode silently; r17 verdict #1)
    val (cents, cellStats) = Similarity.refineCentroidsWithStats(st,
      Similarity.coarseCentroids(st, "v", "id", nCells), "v", "id", lloydIterations)
    val assignedStore = Similarity.assignCells(st, cents, "v", "id")
    val inc = incoming.select(col(idCol).as("id"), col(vecCol).as("v"))
    val probes = multiProbe(inc, cents, nProbe)
    val probeSide = probes.select(col("id").as("query_id"),
      col("v").as("qv"), col("cell"))
    val fused = useFused.getOrElse(
      graft.plans.SdcTopKPlan.cosineLayoutSupported(assignedStore, probeSide))
    if (fused) {
      // fused UNORDERED pair scan (plans/SdcTopKPlan.scala `cospairu`):
      // batch×store candidates score inline against the probe index and
      // only survivors materialize — the compositional join below built
      // an UnsafeRow carrying two full vectors per CANDIDATE, a wall at
      // 10⁷-row backfill batches (r16 verdict #2). Byte-identical
      // output (spec-pinned): same cosineF arithmetic, no id conjunct
      // either way. Mode selection is threshold-based: daily batches
      // broadcast (store streams shuffle-free), backfill-sized batches
      // trip to cell-co-partitioned.
      graft.plans.SdcTopKPlan.pairsCosineAgainst(assignedStore, probeSide,
          threshold, cellStats = cellStats)
        .select(col("query_id").as("id_new"), col("corpus_id").as("id_store"),
          col("ascore").as("cos"))
        .dropDuplicates("id_new", "id_store")
        .select(col("id_new"), col("id_store"), round(col("cos"), 6).as("cos"))
    } else {
      probes.as("n").join(assignedStore.as("s"), col("n.cell") === col("s.cell"))
        .select(col("n.id").as("id_new"), col("s.corpus_id").as("id_store"),
          graft.functions.VectorExpressions.cosineF(col("n.v"), col("s.cv")).as("cos"))
        .filter(col("cos") >= threshold)
        .dropDuplicates("id_new", "id_store")
        .select(col("id_new"), col("id_store"), round(col("cos"), 6).as("cos"))
    }
  }

  def embeddingNearDupsBucketed(
      embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nCells: Int = 16, nProbe: Int = 2,
      lloydIterations: Int = 1,
      useFused: Option[Boolean] = None): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    // WithStats: free skew-salt detection input for the fused pair
    // scan (default-on; r17 verdict #1). The counts are top-1 counts
    // while the operator input is multi-probed — a cell's top-1 share
    // lower-bounds its absolute size, which is the detection estimate
    // (documented in the operator's conf scaladoc).
    val (cents, cellStats) = Similarity.refineCentroidsWithStats(e,
      Similarity.coarseCentroids(e, "v", "id", nCells), "v", "id", lloydIterations)
    val assigned = multiProbe(e, cents, nProbe)
    val corpusSide = assigned.select(col("id").as("corpus_id"),
      col("cell"), col("v").as("cv"))
    val probeSide = assigned.select(col("id").as("query_id"),
      col("v").as("qv"), col("cell"))
    val fused = useFused.getOrElse(
      graft.plans.SdcTopKPlan.cosineLayoutSupported(corpusSide, probeSide))
    if (fused) {
      // fused pair-threshold scan (plans/SdcTopKPlan.scala `cospair`
      // mode, partitioned — both sides ARE the corpus): pairs are
      // scored inline against the per-partition probe index and only
      // survivors materialize as rows. At the 100× soak the
      // compositional join below spent its wall building an UnsafeRow
      // with two full vectors for every one of ~3×10⁸ candidate pairs.
      // Byte-identical output (spec-pinned): same cosineF arithmetic,
      // same a.id < b.id pairing, NaN survives ≥ τ as Spark compares.
      graft.plans.SdcTopKPlan.pairsCosine(corpusSide, probeSide, threshold,
          cellStats = cellStats)
        .select(col("query_id").as("id_a"), col("corpus_id").as("id_b"),
          col("ascore").as("cos"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    } else {
      // compositional fallback (exotic id layouts): equi-join on cell —
      // NOT a cartesian. Verify cosine and FILTER map-side, BEFORE the
      // (id_a, id_b) dedup: only surviving near-dup pairs (tiny) ever
      // shuffle, instead of every candidate row carrying two full
      // vectors. cos is identical for duplicate pair rows, so
      // filter-then-dedup ≡ dedup-then-filter.
      assigned.as("a").join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          graft.functions.VectorExpressions.cosineF(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= threshold)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }
  }

  /** [[embeddingNearDupsBucketed]] with a PQ pre-filter in front of the
    * exact verification. MEASURED NOTE (r16, SCALE.md Round 16): the
    * fused `cospair` scan the plain bucketed form now routes through
    * beats this variant at every measured shape (8.25 s vs 17.8 s at
    * 100×) because the within-cell JOIN — which this variant keeps —
    * is the dominant cost, not the cosine arithmetic the pre-filter
    * skips. Prefer [[embeddingNearDupsBucketed]]; this form remains
    * for arithmetic-bound shapes (and stays gated). Original rationale:
    * the bucketed form exact-scores EVERY within-cell candidate pair
    * with the full-dimension cosine kernel (dim multiply-adds per pair
    * — the dominant cost once bucketing has bounded the pair space); here
    * each pair is first scored by the symmetric PQ statistic
    * cos(decode(a), decode(b)) = m table reads against ONE shared
    * broadcast [[Pq.sdcTable]] plus a precomputed per-ROW
    * reconstruction norm, and only pairs with approx ≥ threshold −
    * `margin` reach the exact kernel. FAIL-OPEN: a degenerate
    * (zero-norm) reconstruction cannot be approximated, so such pairs
    * pass straight to exact verification — the pre-filter only ever
    * SKIPS work it is confident about. Precision stays 1.0 by
    * construction (every emitted pair is exact-verified); recall loss
    * is bounded by how often quantization underestimates a true pair
    * by more than `margin` (gated ≥ 0.9 by x_ann_pq_prerank_recall).
    *
    * Plan shape is IDENTICAL to the bucketed form (same cell
    * equi-join, same map-side filter-then-dedup) — the codes/norm
    * columns are narrow maps and the pre-filter is one more conjunct
    * evaluated BEFORE the cosine in the fused predicate.
    */
  def embeddingNearDupsBucketedPq(
      embs: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nCells: Int = 16, nProbe: Int = 2,
      lloydIterations: Int = 1, margin: Double = 0.2,
      m: Int = 8, ksub: Int = 16,
      prebuiltCodebooks: Option[DataFrame] = None): DataFrame = {
    require(margin >= 0.0, s"embeddingNearDupsBucketedPq: bad margin $margin")
    val e = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val dim = e.select(size(col("v"))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException(
        "embeddingNearDupsBucketedPq: empty corpus")
    }
    val spark = embs.sparkSession
    // codebooks train on NORMALIZED vectors so the SDC statistic
    // approximates cosine; one bounded-codebook collect, same as the
    // flat-PQ path. A caller that already trained a codebook on the
    // SAME normalized corpus at the same (dim, m, ksub) — e.g. a row
    // that also runs the prerank top-k — passes it in and skips the
    // training passes; the training is deterministic, so prebuilt ==
    // retrained when the inputs match (DedupSpec pins the equality).
    val cb = prebuiltCodebooks.getOrElse {
      val en = e.select(col("id"), Pq.normalized(col("v")).as("nv"))
      Pq.trainCodebooks(en, "nv", "id", dim, m, ksub, iterations = 1)
    }
    // ONE bounded codebook collect feeds the SDC table and the encode
    // column (the kernel wrapper's broadcast cache ships one payload)
    val (cbFlat, cbHalves) = Pq.flatCbArrays(cb, dim, m, ksub)
    val tbl = spark.sparkContext.broadcast(
      Pq.sdcTableFromFlat(cbFlat, dim, m, ksub))
    def sdc(a: Column, b: Column) =
      graft.functions.VectorExpressions.pqSdcScore(a, b, tbl, m, ksub)
    val cents = Similarity.refineCentroids(e,
      Similarity.coarseCentroids(e, "v", "id", nCells), "v", "id", lloydIterations)
    // codes + reconstruction norm are computed ONCE per vector, BELOW
    // the probe row-expansion (the m·ksub·dsub encode kernel would
    // otherwise run nProbe times per vector); the probe rows then just
    // CARRY the m-byte codes — noise next to the vector they ride with
    val eEnc = e
      .withColumn("codes",
        Pq.codesOnFlat(cbFlat, cbHalves, Pq.normalized(col("v")), dim, m, ksub))
      .withColumn("rnorm", sqrt(sdc(col("codes"), col("codes"))))
    val assigned = multiProbe(eEnc, cents, nProbe)
    // approx = reconstruction cosine; zero-norm rows fail open (pass)
    val approx = when(col("a.rnorm") > 0 && col("b.rnorm") > 0,
      sdc(col("a.codes"), col("b.codes")) / (col("a.rnorm") * col("b.rnorm")))
      .otherwise(lit(Double.PositiveInfinity))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(approx >= threshold - margin)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.VectorExpressions.cosineF(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
