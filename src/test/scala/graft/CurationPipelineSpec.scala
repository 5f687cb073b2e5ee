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
}
