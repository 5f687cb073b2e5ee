package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextOps}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "THE  QUICK brown fox jumps over the lazy dog"),  // exact dup of 1 after normalization
    (4L, "completely different text about spark engines and data"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id representative per normalized text") {
    val out = Dedup.exact(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L, 4L, 5L)) // 3 collapsed into 1
  }

  test("exactKeepBest keeps the max-prefer duplicate, ties to min id") {
    val scored = Seq(
      (1L, "same text here", 10),
      (2L, "SAME   text here", 50), // normalized-dup of 1, higher quality → kept
      (3L, "same text here", 50),   // ties with 2 on prefer → min id (2) wins
      (4L, "different", 5)
    ).toDF("doc_id", "text", "quality")
    val out = Dedup.exactKeepBest(scored, "text", "doc_id", "quality")
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(2L, 4L))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(3L))
    assert(fps(1L) !== fps(2L))
  }

  test("jaccardPairs finds the near-dup pair with correct similarity") {
    val out = Dedup.jaccardPairs(docs, "text", "doc_id", shingleSize = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect()
    // docs 1,2 share 6 of 8 distinct 3-shingles -> j = 6/8 = 0.75; 1,3 identical -> 1.0
    val m = out.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((1L, 3L)) === 1.0)
    assert(m((1L, 2L)) === 0.75)
    assert(m((2L, 3L)) === 0.75)
    assert(!m.contains((1L, 4L)))
  }

  test("jaccardPairs maxShingleDf drops hot shingles from the candidate space") {
    // "x y z" appears in ALL docs (stop-phrase); distinct tails differ
    val hot = Seq(
      (1L, "x y z alpha beta gamma"),
      (2L, "x y z alpha beta delta"),
      (3L, "x y z completely different tail here"),
      (4L, "x y z nothing shared at all okay")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(hot, "text", "doc_id", shingleSize = 3, threshold = 0.01)
    val capped = Dedup.jaccardPairs(hot, "text", "doc_id", shingleSize = 3,
      threshold = 0.01, maxShingleDf = Some(3))
    // uncapped: every pair shares "x y z" -> 6 candidate pairs
    assert(uncapped.count() === 6)
    // capped: "x y z" (df=4) removed; only 1-2 still share shingles
    val c = capped.as[(Long, Long, Double)].collect()
    assert(c.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
  }

  test("exactAgainstStore drops incoming docs already fingerprinted in the store") {
    val store = Seq((1L, "the quick brown fox"), (2L, "other corpus text"))
      .toDF("doc_id", "text")
      .select(TextOps.fingerprint(col("text")).as("fp"))
    val incoming = Seq(
      (10L, "THE  QUICK brown fox"),  // normalized-dup of store doc 1 -> dropped
      (11L, "genuinely new document")
    ).toDF("doc_id", "text")
    val out = Dedup.exactAgainstStore(incoming, "text", store)
      .select("doc_id").as[Long].collect()
    assert(out === Array(11L))
  }

  test("minhashNearDupsAgainst pairs incoming near-dups with store docs only") {
    val store = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast today"),
      (2L, "completely unrelated corpus document about spark engines and data")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs away fast tonight"),
      (11L, "nothing in common with anything stored before at all honestly"),
      // near-dup of ANOTHER INCOMING doc but no store doc — must NOT pair
      (12L, "nothing in common with anything stored before at all frankly")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashNearDupsAgainst(incoming, store, "text", "doc_id",
        shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_new", "id_store").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 1L)))
  }

  test("banded signature store round-trips through parquet (persisted == direct)") {
    val store = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast today"),
      (2L, "completely unrelated corpus document about spark engines and data")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs away fast tonight")
    ).toDF("doc_id", "text")
    val direct = Dedup.minhashNearDupsAgainst(incoming, store, "text", "doc_id",
        shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_new", "id_store", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    Dedup.bandedSignatures(store, "text", "doc_id", shingleSize = 3, k = 64, bands = 16)
      .write.mode("overwrite").parquet(dir)
    val viaStore = Dedup.minhashNearDupsAgainstBanded(
        Dedup.bandedSignatures(incoming, "text", "doc_id", shingleSize = 3, k = 64, bands = 16),
        spark.read.parquet(dir), k = 64, threshold = 0.5)
      .select("id_new", "id_store", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaStore === direct)
    assert(direct.map(p => (p._1, p._2)) === Set((10L, 1L)))
  }

  test("connectedComponents resolves transitive chains, labels singletons") {
    // chain 1-2, 2-3, 3-4 (diameter 3 — needs >1 propagation round) plus
    // pair 10-11 and singletons 20, 21
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L).toDF("id")
    val cc = Dedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("connectedComponents reliable-checkpoint path matches local pin") {
    // cluster mode guard: with a checkpoint dir the per-round pins go
    // through reliable checkpoints (survive executor loss) — same labels
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val cc = Dedup.connectedComponents(edges, nodes, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("connectedComponents pointer-jump: a diameter-48 chain resolves in " +
      "O(log d) rounds with exact min labels (r18 round compression)") {
    // 49-node path 100..148 (worst case for plain min propagation: 48
    // rounds) — the jump step must both keep the labels exact and
    // converge within the default maxIterations = 20
    val ids = (100L to 148L)
    val edges = ids.sliding(2).map(w => (w(0), w(1))).toSeq.toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges, ids.toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(cc === ids.map(_ -> 100L).toMap)
  }

  test("connectedComponents throws rather than return unconverged labels") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val nodes = (1L to 5L).toDF("id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, nodes, maxIterations = 1).collect()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("keepClusterRepresentatives works when idCol is literally 'id'") {
    val docsId = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "payload")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.keepClusterRepresentatives(docsId, pairs, "id")
      .select("id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
  }

  test("keepClusterRepresentatives keeps one doc per near-dup cluster") {
    // docs 1,2,3 are a transitive near-dup cluster via jaccard pairs;
    // 4 and 5 survive as singletons
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", shingleSize = 3, threshold = 0.5)
    val kept = Dedup.keepClusterRepresentatives(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L, 5L))
  }

  test("minhash est_jaccard approximates true jaccard for identical docs") {
    val out = Dedup.minhashNearDups(docs, "text", "doc_id",
        shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val m = out.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((1L, 3L)) === 1.0) // identical signatures
    assert(m.contains((1L, 2L)) || m.contains((2L, 3L))) // high-sim pair caught by LSH
  }

  test("minhashNearDups maxBucketSize drops boilerplate mega-buckets, keeps clean pairs") {
    // 30 identical boilerplate docs → one mega-bucket per band → O(m²)
    // candidate pairs dominating the join (the skew failure mode)
    val boiler = (100L until 130L)
      .map(i => (i, "copy paste boilerplate license header text exactly the same every time"))
    val mixed = docs.union(boiler.toDF("doc_id", "text"))
    val uncapped = Dedup.minhashNearDups(mixed, "text", "doc_id",
      shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
    assert(uncapped.count() >= 30L * 29 / 2) // 435 boilerplate pairs alone
    val capped = Dedup.minhashNearDups(mixed, "text", "doc_id",
      shingleSize = 3, k = 64, bands = 16, threshold = 0.5, maxBucketSize = Some(5))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every bucket holding the 30 boilerplate docs exceeds the cap, so
    // their pair space is gone entirely...
    assert(!capped.exists(_._1 >= 100L))
    // ...while the small-corpus buckets (≤3 docs) are untouched: the
    // clean fixture's pairs survive identically
    val cleanUncapped = Dedup.minhashNearDups(docs, "text", "doc_id",
      shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === cleanUncapped)
  }

  test("simhash: identical docs hash identically; near-dups are close") {
    val hashed = Dedup.simhashDf(docs, "text", "doc_id", shingleSize = 3)
      .as[(Long, Long)].collect().toMap
    assert(hashed(1L) === hashed(3L))
    val d12 = java.lang.Long.bitCount(hashed(1L) ^ hashed(2L))
    val d14 = java.lang.Long.bitCount(hashed(1L) ^ hashed(4L))
    assert(d12 < d14, s"near-dup hamming $d12 should beat unrelated $d14")
  }

  test("simhash rotations catch pairs the prefix-only bucketing misses") {
    // craft docs whose simhashes differ in few bits INCLUDING a top bit:
    // use near-identical shingle sets so hamming is small, then check
    // the multi-rotation variant finds at least as many pairs as the
    // single-rotation one on the real fixture corpus
    val one = Dedup.simhashNearDups(docs, "text", "doc_id",
      shingleSize = 3, maxHamming = 40, prefixBits = 16, rotations = 1)
    val four = Dedup.simhashNearDups(docs, "text", "doc_id",
      shingleSize = 3, maxHamming = 40, prefixBits = 16, rotations = 4)
    val p1 = one.select("id_a", "id_b").collect().toSet
    val p4 = four.select("id_a", "id_b").collect().toSet
    assert(p1.subsetOf(p4))
    assert(p4.size >= p1.size)
    // identical docs (1,3) must be found by every variant
    assert(p4.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
    assert(p1.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
  }

  test("embeddingNearDupsBucketed: no cartesian, no false positives, high recall vs exact") {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(_ => vec())
    // 40 random bases + 20 planted near-dups (tiny perturbations of bases 0..19):
    // the planted pairs are the ground-truth near-dup set at threshold 0.95
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until 20).map { i =>
        (100L + i, base(i).map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
      }
    val e = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(e, "embedding", "vec_id", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 20) // all planted pairs visible to the exact path
    val bucketed = Dedup.embeddingNearDupsBucketed(e, "embedding", "vec_id",
      threshold = 0.95, nCells = 8, nProbe = 2)
    val got = bucketed.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the final cosine verify is exact, so bucketing can only MISS pairs,
    // never invent them
    assert(got.subsetOf(exact))
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"bucketed recall $recall below 0.9 (got ${got.size}/${exact.size})")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair generation must be a cell equi-join, not a cartesian")
  }

  test("embeddingNearDupsBucketed: degenerate corpus auto-salts by DEFAULT, output invariant") {
    // r17 verdict #1: a duplicate-heavy corpus collapses one trained
    // cell; with no conf set, the fused pair scan must now detect it
    // from the refinement stats (free) and salt — identical pairs
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val hot = vec()
    // 60% of rows are tiny perturbations of one vector -> one cell
    // holds ~60% of the corpus after refinement
    val rows = (0 until 120).map { i =>
      val v = if (i < 72) hot.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
              else vec()
      (i.toLong, v)
    }
    val e = rows.toDF("vec_id", "embedding")
    val saltKey = graft.plans.SdcTopKPlan.skewSaltFactorKey
    spark.conf.unset(saltKey)
    val got = Dedup.embeddingNearDupsBucketed(e, "embedding", "vec_id",
        threshold = 0.95, nCells = 8, nProbe = 2)
      .orderBy("id_a", "id_b").collect()
    assert(graft.plans.SdcTopKPlan.lastSaltDecision.endsWith("src=stats"),
      s"expected default-on stats salting, got " +
        s"'${graft.plans.SdcTopKPlan.lastSaltDecision}'")
    assert(got.nonEmpty)
    spark.conf.set(saltKey, "off")
    try {
      val want = Dedup.embeddingNearDupsBucketed(e, "embedding", "vec_id",
          threshold = 0.95, nCells = 8, nProbe = 2)
        .orderBy("id_a", "id_b").collect()
      assert(graft.plans.SdcTopKPlan.lastSaltDecision === "unsalted")
      assert(got === want)
    } finally spark.conf.unset(saltKey)
  }

  test("embeddingNearDupsBucketedPq: PQ pre-filter keeps precision 1.0 and ≥0.9 recall") {
    // same planted-near-dup fixture as the bucketed test: the PQ
    // pre-filter must stay a strict work-skipper — every emitted pair
    // exact-verified (subset of exact), recall within the same bound,
    // and the plan still a cell equi-join
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(_ => vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (0 until 20).map { i =>
        (100L + i, base(i).map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
      }
    val e = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDups(e, "embedding", "vec_id", threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pq = Dedup.embeddingNearDupsBucketedPq(e, "embedding", "vec_id",
      threshold = 0.95, nCells = 8, nProbe = 2, margin = 0.2, m = 4, ksub = 8)
    val got = pq.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact), "exact verify stage must keep precision 1.0")
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"pq-prefiltered recall $recall below 0.9 " +
      s"(got ${got.size}/${exact.size})")
    val plan = pq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair generation must stay a cell equi-join")
    // a prebuilt codebook trained on the same normalized corpus at the
    // same (dim, m, ksub) must be byte-identical to the internal
    // retraining — the contract that lets a caller share one training
    // pass across the prerank and near-dup paths
    val en = e.select(col("vec_id").as("id"),
      graft.ext.Pq.normalized(col("embedding")).as("v"))
    val cb = graft.ext.Pq.trainCodebooks(en, "v", "id",
      dim = 16, m = 4, ksub = 8, iterations = 1)
    val viaPrebuilt = Dedup.embeddingNearDupsBucketedPq(e, "embedding",
        "vec_id", threshold = 0.95, nCells = 8, nProbe = 2, margin = 0.2,
        m = 4, ksub = 8, prebuiltCodebooks = Some(cb))
      .orderBy("id_a", "id_b").collect()
    assert(viaPrebuilt === pq.orderBy("id_a", "id_b").collect())
  }

  test("embeddingNearDupsAgainst: batch probes the store, no store self-pairs, high recall") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val storeBase = (0 until 40).map(i => (i.toLong, vec()))
    // batch: 15 near-dups of store vectors 0..14 + 5 fresh vectors
    val batch = (0 until 15).map { i =>
      (200L + i, storeBase(i)._2.map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
    } ++ (0 until 5).map(i => (300L + i, vec()))
    val st = storeBase.toDF("vec_id", "embedding")
    val b = batch.toDF("vec_id", "embedding")
    // ground truth: exact cosine of every batch×store pair at 0.95
    val exact = b.as("n").crossJoin(st.as("s"))
      .select(col("n.vec_id").as("id_new"), col("s.vec_id").as("id_store"),
        graft.functions.VectorExpressions.cosineF(
          col("n.embedding"), col("s.embedding")).as("cos"))
      .filter(col("cos") >= 0.95)
      .select("id_new", "id_store").as[(Long, Long)].collect().toSet
    assert(exact.size >= 15)
    val got = Dedup.embeddingNearDupsAgainst(b, st, "embedding", "vec_id",
        threshold = 0.95, nCells = 8, nProbe = 2)
    val gotPairs = got.select("id_new", "id_store").as[(Long, Long)].collect().toSet
    assert(gotPairs.subsetOf(exact), "exact verify can only miss, never invent")
    val recall = gotPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"incremental recall $recall below 0.9")
    // every emitted pair is batch-side id_new — never a store self-pair
    assert(gotPairs.forall { case (n, s2) => n >= 200L && s2 < 200L })
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("embeddingNearDups finds identical vectors") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDups(e, "embedding", "vec_id", threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(out === Array((1L, 2L, 1.0)))
  }

  test("duplicatePassages: shared window flags both docs, unique and short docs don't") {
    val shared = "alpha beta gamma delta epsilon"       // one 5-token window
    val d = Seq(
      (1L, s"intro one two $shared"),                   // 8 tokens → 4 windows, 1 shared
      (2L, s"$shared closing words here"),              // 8 tokens → 4 windows, 1 shared
      (3L, "totally different text with nothing shared at all"),
      (4L, "too short")                                 // < 5 tokens → no windows
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatePassages(d, "text", "doc_id", n = 5)
      .select("id", "n_windows", "n_dup_windows", "dup_frac")
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 1L, Some(0.25))))
    assert(out(2L) === ((2L, 4L, 1L, Some(0.25))))
    assert(out(3L)._3 === 0L && out(3L)._4 === Some(0.0))
    assert(out(4L) === ((4L, 0L, 0L, None)))
  }

  test("removeDuplicatePassages cuts the shared span, preserves unique text and case") {
    val shared = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, s"Intro ONE two $shared"),
      (2L, s"$shared Closing words here"),
      (3L, "totally different text with nothing shared at all"),
      (4L, "too short"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatePassages(d, "text", "doc_id", n = 5)
      .select("id", "clean_text", "n_kept_tokens")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "Intro ONE two", 3L)))       // case preserved
    assert(out(2L) === ((2L, "Closing words here", 3L)))
    assert(out(3L)._2 === "totally different text with nothing shared at all")
    assert(out(4L) === ((4L, "too short", 2L)))           // < n tokens untouched
    assert(out(5L) === ((5L, "", 0L)))
  }

  test("duplicatePassagesAgainst: store passages flag the batch; store round-trips") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon new tail"),   // 1 of 3 windows in store
      (11L, "completely fresh words nothing shared here ok"),
      (12L, "completely fresh words nothing shared here ok") // batch-internal dup of 11
    ).toDF("doc_id", "text")
    val store = Dedup.windowStore(corpus, "text", "doc_id", n = 5)
    def run(st: org.apache.spark.sql.DataFrame) =
      Dedup.duplicatePassagesAgainst(batch, st, "text", "doc_id", n = 5)
        .select("id", "n_windows", "n_dup_windows", "dup_frac")
        .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    val out = run(store)
    assert(out(10L) === ((10L, 3L, 1L, Some(0.333333))))
    assert(out(11L) === ((11L, 3L, 3L, Some(1.0))))
    assert(out(12L) === ((12L, 3L, 3L, Some(1.0))))
    // the persisted store produces identical results (the daily shape)
    val dir = java.nio.file.Files.createTempDirectory("graft-winstore").toString
    try {
      store.write.mode("overwrite").parquet(dir)
      assert(run(spark.read.parquet(dir)) === out)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("winnowingFingerprints: window-min selection, rightmost ties, shared-run guarantee") {
    // doc 1 and 2 share the 6-word run "a b c d e f" (>= w+k-1 = 6
    // words) inside different surroundings -> MUST share a fingerprint
    val docs = Seq(
      (1L, "a b c d e f x1 y1 z1 q1"),
      (2L, "p2 r2 a b c d e f t2"),
      (3L, "u3 v3 w3 x3 y3 z3 p3 q3"), // unrelated
      (4L, "s t u")                     // 1 shingle < window: global min only
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "text", "doc_id",
      shingleSize = 3, window = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
    // short doc: exactly one fingerprint at pos 0
    assert(byDoc(4L).map(r => (r.getInt(1), r.getLong(2))).toSeq.length === 1)
    assert(byDoc(4L).head.getInt(1) === 0)
    // the shared-run guarantee
    val f1 = byDoc(1L).map(_.getLong(2)).toSet
    val f2 = byDoc(2L).map(_.getLong(2)).toSet
    val f3 = byDoc(3L).map(_.getLong(2)).toSet
    assert((f1 & f2).nonEmpty, s"shared 6-word run must share a fingerprint: $f1 vs $f2")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty, "unrelated doc must not collide")
    // selection replay: hand-winnow doc 1's hash sequence
    val hs = docs.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .select(graft.ext.TextOps.shingleHashes(
        org.apache.spark.sql.functions.col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    val expect = (0 to hs.length - 4).map { s0 =>
      val win = (s0 until s0 + 4).map(p => (hs(p), p))
      // min hash, rightmost position on ties
      val m = win.minBy { case (h, p) => (h, -p) }
      (m._2, m._1)
    }.toSet
    assert(byDoc(1L).map(r => (r.getInt(1), r.getLong(2))).toSet === expect)
    // determinism across partitionings
    val again = Dedup.winnowingFingerprints(docs.repartition(7), "text", "doc_id",
      shingleSize = 3, window = 4).collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)
    assert(again === fps.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq))
  }

  test("winnowingOverlapPairs finds partial copies, honors the hot-fingerprint cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // partial copy: a 6-word run of doc 1 (= w+k-1, the guarantee
      // threshold) inside new surroundings
      (2L, "one two gamma delta epsilon zeta eta theta three four"),
      (3L, "unrelated words entirely different content here now ok fine yes")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingOverlapPairs(docs, "text", "doc_id",
        shingleSize = 3, window = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"partial copy must pair, got $pairs")
    // boilerplate cap: a fingerprint present in EVERY doc gets dropped
    val boiler = Seq(
      (1L, "common shared boiler plate line alpha"),
      (2L, "common shared boiler plate line beta"),
      (3L, "common shared boiler plate line gamma")
    ).toDF("doc_id", "text")
    val capped = Dedup.winnowingOverlapPairs(boiler, "text", "doc_id",
      shingleSize = 3, window = 4, minShared = 1, maxFpDf = Some(2))
    val uncapped = Dedup.winnowingOverlapPairs(boiler, "text", "doc_id",
      shingleSize = 3, window = 4, minShared = 1)
    assert(uncapped.count() > 0)
    assert(capped.count() < uncapped.count())
  }
}
