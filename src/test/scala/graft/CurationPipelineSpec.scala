package graft

import graft.ext.CurationPipeline

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // one doc per drop reason + two survivors; prose long enough to clear
  // the quality gate (len >= 50, stopwords, alpha)
  private val keepA =
    "the alpha document is about the spark engine and it keeps running along fine today"
  private val keepB =
    "this beta document is about a completely different warehouse topic and it is also fine"
  private val docs = Seq(
    (1L, keepA),
    (2L, keepB),
    (3L, "!!! ??? ,,, ;;;"),                                    // fails quality
    (4L, "the alpha document is about the spark engine and " +
      "this tail is new but the head is a benchmark five gram"), // contaminated vs benchmark
    (5L, "THE  ALPHA document is about the spark engine and it keeps " +
      "running along fine today"),                               // exact dup of 1 (normalized)
    (6L, keepA.replace("today", "tonight"))                      // near-dup of 1 -> clustered
  ).toDF("doc_id", "text")

  // benchmark shares a 5-gram with doc 4's head (and doc 1's too? no —
  // benchmark text is doc 4's distinctive head phrase only)
  private val benchmark = Seq(
    (100L, "head is a benchmark five gram indeed")).toDF("doc_id", "text")

  test("curate applies every stage: quality, decontamination, exact + near dedup") {
    val (out, counts) = CurationPipeline.curateWithReport(
      docs, benchmark, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5)
    assert(counts.input === 6)
    assert(counts.afterQuality === 5)          // doc 3 dropped
    assert(counts.afterDecontamination === 4)  // doc 4 dropped
    assert(counts.afterExactDedup === 3)       // doc 5 collapsed into 1
    assert(counts.afterNearDedup === 2)        // doc 6 clustered with 1
    assert(out.select("doc_id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("curate with the semantic gate also drops paraphrase-level contamination") {
    // doc 2 shares NO n-gram with the benchmark, but its embedding is
    // near-parallel to a benchmark embedding — only the semantic gate
    // catches it
    val corpusEmb = Seq(
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.95f, 0.05f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f)),
      (6L, Array(0.0f, 0.9f, 0.1f))
    ).toDF("doc_id", "embedding")
    val benchEmb = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("doc_id", "embedding")
    val out = CurationPipeline.curate(
      docs, benchmark, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5,
      semantic = Some((corpusEmb, benchEmb, "embedding", 0.9)))
    // baseline survivors were {1, 2}; the semantic gate removes 2
    assert(out.select("doc_id").as[Long].collect().sorted === Array(1L))
  }

  test("maxShingleDf reaches the near-dup stage: capping hot shingles splits a boilerplate cluster") {
    // six docs that are pairwise near-dups ONLY through a shared
    // boilerplate body (every shared shingle has df=6); each has a
    // distinct tail. Uncapped, all six collapse to one representative;
    // with the cap below 6 the shared shingles are dropped, no pair
    // survives, and all six come back. The driver's sf0.01 gate cannot
    // distinguish capped from uncapped (no pair crosses the threshold
    // either way there), so THIS is the pin that the parameter is
    // actually wired through curate -> jaccardPairs.
    val boiler = "the common license header text is repeated on every page of this corpus and " +
      "it keeps being the dominant content for all of them"
    val six = (1 to 6).map(i => (i.toLong, s"$boiler unique tail $i")).toDF("doc_id", "text")
    val noBench = Seq((100L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    val uncapped = CurationPipeline.curate(six, noBench, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5,
      maxShingleDf = None)
    val capped = CurationPipeline.curate(six, noBench, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5,
      maxShingleDf = Some(4))
    assert(uncapped.count() === 1L, "uncapped: boilerplate cluster collapses to one rep")
    assert(capped.count() === 6L, "capped: hot shingles dropped, no pairs form")
    // df=6 is under the scale-safe default cap (64), so the DEFAULT path
    // must behave like the uncapped one here
    val default = CurationPipeline.curate(six, noBench, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5)
    assert(default.count() === 1L, "default: cap is a no-op below 64 df")
  }

  test("the DEFAULT maxShingleDf is a real cap: a df>64 boilerplate cluster does not explode") {
    // 70 docs sharing the same boilerplate body: every shared shingle's
    // df is 70 > DefaultMaxShingleDf, so with the DEFAULT arguments the
    // hot shingles are dropped before the pair join and no pair forms —
    // the exact shape (replica-heavy corpus) that killed the uncapped
    // join at the 100x soak. Explicit None still collapses the cluster.
    val boiler = "the common license header text is repeated on every page of this corpus and " +
      "it keeps being the dominant content for all of them"
    val many = (1 to 70).map(i => (i.toLong, s"$boiler unique tail $i")).toDF("doc_id", "text")
    val noBench = Seq((100L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    assert(CurationPipeline.DefaultMaxShingleDf === 64)
    val default = CurationPipeline.curate(many, noBench, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5)
    assert(default.count() === 70L, "default cap drops df>64 shingles; no pairs form")
    val optOut = CurationPipeline.curate(many, noBench, "text", "doc_id",
      minQuality = 0.5, ngram = 5, shingleSize = 3, jaccardThreshold = 0.5,
      maxShingleDf = None)
    assert(optOut.count() === 1L, "explicit None restores exact jaccard collapse")
  }
}
