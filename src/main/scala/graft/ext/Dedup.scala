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
    * (odd-a wraparound multiply mod 2⁶⁴ is a bijection).
    */
  private def permuteConsts(seed: Int): (Long, Long) = (
    2 * (0x9E3779B97F4A7C15L * (seed + 1) ^ (seed * 0xC2B2AE3D27D4EB4FL)) + 1,
    0x165667B19E3779F9L * (seed + 13))

  def minhashSignature(shingles: Column, k: Int): Column = {
    val baseHashes = transform(shingles, s => xxhash64(s))
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
        explode(TextOps.wordShingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
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
        xxhash64(concat_ws(",",
          slice(signature, b * rowsPerBand + 1, rowsPerBand)), lit(b)).as("bucket"))
    }: _*)
  }

  /** MinHash+LSH near-duplicate pairs: shingle → sign → band → explode →
    * self-join on (band, bucket) → verify estimated Jaccard from the full
    * signatures. Returns (idA, idB, est_jaccard) with idA < idB.
    *
    * Shuffle profile: one shuffle on band-bucket (the join), candidate
    * set ≪ n²; the verify step is a map over joined rows. At 100 TB,
    * tune `bands`/`k` for the target threshold (threshold ≈
    * (1/bands)^(1/rowsPerBand)) so buckets stay small, and salt any hot
    * bucket (boilerplate docs) before the self-join.
    */
  def minhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val signed = minhashSignatureDf(docs, textCol, idCol, shingleSize, k)
    val banded = signed
      .select(col("id"), col("sig"), explode(lshBands(col("sig"), k, bands)).as("b"))
      .select(col("id"), col("sig"), col("b.band"), col("b.bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast(DoubleType) / lit(k.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
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
        explode(TextOps.wordShingles(col(textCol), shingleSize)).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
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
    */
  def simhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, maxHamming: Int = 3,
      prefixBits: Int = 16, rotations: Int = 4): DataFrame = {
    val hashed = simhashDf(docs, textCol, idCol, shingleSize)
    val step = 64 / rotations
    val rot = explode(array((0 until rotations).map { r =>
      val k = r * step
      val rotated =
        if (k == 0) col("sh")
        else shiftleft(col("sh"), k).bitwiseOR(shiftrightunsigned(col("sh"), 64 - k))
      struct(lit(r).as("r"), shiftrightunsigned(rotated, 64 - prefixBits).as("b"))
    }: _*))
    val bucketed = hashed.select(col("id"), col("sh"), rot.as("rb"))
      .select(col("id"), col("sh"), col("rb.r").as("r"), col("rb.b").as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.r") === col("b.r") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
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
    val sh = docs.select(
        col(idCol).as("id"),
        array_distinct(TextOps.wordShingles(col(textCol), shingleSize)).as("shingles"))
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

  /** Embedding-cosine near-duplicate pairs — see [[Similarity.cosine]]
    * for the math; bucketing via [[Similarity]] IVF at scale.
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
}
