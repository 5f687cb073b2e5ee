package graft

import org.apache.spark.sql.functions._
import graft.ext.SelectionPipeline

class SelectionPipelineSpec extends SparkSpec {
  import spark.implicits._

  // prose-like text clears the quality gate (length/alpha/stopwords);
  // junk does not
  private val prose = "the quick brown fox jumps over the lazy dog and " +
    "then it runs far away to the old barn by the river " * 2
  private val junk = "@@@@ #### $$$$ %%%%"

  private def docs = Seq(
    // blocked domain
    (0L, prose + "zero", "en", "s0", 500L, "https://bad.com/a"),
    // clean, target lang, enough per-source rows to exercise the cap
    (1L, prose + "one", "en", "s1", 400L, "https://ok.org/b"),
    (2L, prose + "two", "en", "s1", 300L, "https://ok.org/c"),
    (3L, prose + "three", "en", "s1", 200L, "https://ok.org/d"),
    // clean but junk text -> quality gate drops it
    (4L, junk, "en", "s2", 100L, "https://ok.org/e"),
    // clean, off-target lang
    (5L, prose + "fünf", "de", "s3", 250L, "https://ok.org/f")
  ).toDF("doc_id", "text", "lang", "source", "n_chars", "url")

  private def blocklist = Seq("bad.com").toDF("domain")

  test("stage wiring: blocklist, quality, cap, and DSIR select compose") {
    val (sel, counts) = SelectionPipeline.selectWithReport(
      docs, col("url"), blocklist, "text", "doc_id", "source",
      capOrder = col("n_chars"), isTarget = col("lang") === "en",
      minQuality = 0.5, maxPerSource = 2, k = 3, nBuckets = 64)
    // 6 in; doc 0 blocked; url dedup off (= afterBlocklist); doc 4
    // junk; cap 2/source drops doc 3 (s1 keeps n_chars 400, 300)
    assert(counts == SelectionPipeline.StageCounts(6, 5, 5, 4, 3, 3))
    val ids = sel.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 5L))
    // the blocked and junk docs can never appear regardless of weight
    assert(!ids.contains(0L) && !ids.contains(4L))
  }

  test("urlDedupPrefer collapses same-canonical-URL fetches before quality") {
    // doc 2 is a tracking-param refetch of doc 1's page; prefer length
    // keeps doc 1 (400 > 300)
    val d = docs.withColumn("url",
      when(col("doc_id") === 2, lit("https://ok.org/b?utm_source=x"))
        .otherwise(when(col("doc_id") === 1, lit("https://ok.org/b"))
          .otherwise(col("url"))))
    val sel = SelectionPipeline.select(
      d, col("url"), blocklist, "text", "doc_id", "source",
      capOrder = col("n_chars"), isTarget = col("lang") === "en",
      minQuality = 0.5, maxPerSource = 10, k = 10, nBuckets = 64,
      urlDedupPrefer = Some(col("n_chars")))
    val ids = sel.select("id").as[Long].collect().toSet
    assert(!ids.contains(2L) && ids.contains(1L))
    // the report path runs the SAME chain: the dedup stage count shows
    // the collapse (5 unblocked -> 4 after url dedup)
    val (selR, counts) = SelectionPipeline.selectWithReport(
      d, col("url"), blocklist, "text", "doc_id", "source",
      capOrder = col("n_chars"), isTarget = col("lang") === "en",
      minQuality = 0.5, maxPerSource = 10, k = 10, nBuckets = 64,
      urlDedupPrefer = Some(col("n_chars")))
    assert(counts == SelectionPipeline.StageCounts(6, 5, 4, 3, 3, 3))
    assert(selR.select("id").as[Long].collect().toSet == ids)
  }

  test("k caps the selection by importance weight") {
    val sel = SelectionPipeline.select(
      docs, col("url"), blocklist, "text", "doc_id", "source",
      capOrder = col("n_chars"), isTarget = col("lang") === "en",
      minQuality = 0.5, maxPerSource = 10, k = 2, nBuckets = 64)
    assert(sel.count() == 2)
  }
}
