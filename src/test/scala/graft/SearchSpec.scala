package graft

import graft.ext.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark join window"),     // heavy on "spark"
    (2L, "spark join table scan filter"),      // one hit
    (3L, "table scan filter sort merge sort"), // no query term
    (4L, "vector vector spark")                // rare term, short doc
  ).toDF("doc_id", "text")

  test("bm25 ranks by relevance, excludes no-hit docs, ranks are sequential") {
    val out = Search.bm25(docs, "text", "doc_id", Seq("spark", "vector"), topK = 10)
      .select("id", "score", "rank").as[(Long, Double, Int)].collect()
      .sortBy(_._3)
    assert(out.map(_._1).toSet === Set(1L, 2L, 4L)) // doc 3 has no query term
    assert(out.map(_._3).toSeq === (1 to out.length))
    // "vector" is rarer than "spark" (df 1 vs 3) and doc 4 is shortest →
    // doc 4 outranks the others; the single-hit long doc ranks last
    assert(out.head._1 === 4L)
    assert(out.last._1 === 2L)
    // scores strictly positive and non-increasing in rank order
    assert(out.forall(_._2 > 0.0))
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
  }

  test("bm25 with no matching term returns empty, not an error") {
    val out = Search.bm25(docs, "text", "doc_id", Seq("zzz", "qqq"), topK = 5)
    assert(out.count() === 0)
  }

  test("bm25 query terms are case-normalized like the corpus") {
    val upper = Search.bm25(docs, "text", "doc_id", Seq("SPARK"), topK = 5)
      .select("id").as[Long].collect().toSet
    val lower = Search.bm25(docs, "text", "doc_id", Seq("spark"), topK = 5)
      .select("id").as[Long].collect().toSet
    assert(upper === lower && upper.nonEmpty)
  }

  test("bm25 tf saturation: 3 hits beats 1 hit in same-length docs") {
    val d = Seq(
      (1L, "spark spark spark pad pad"),
      (2L, "spark pad pad pad pad")
    ).toDF("doc_id", "text")
    val out = Search.bm25(d, "text", "doc_id", Seq("spark"), topK = 5)
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(out(1L) === 1 && out(2L) === 2)
  }

  test("keyTerms surfaces distinctive terms, sinks corpus-wide ones") {
    val d = Seq(
      (1L, "common zebra zebra common common"),
      (2L, "common yak common common common"),
      (3L, "common common common common llama")
    ).toDF("doc_id", "text")
    val out = Search.keyTerms(d, "text", "doc_id", topK = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    // 'common' is in every doc → idf ln(4/4)=0; the unique term wins
    assert(out === Map(1L -> "zebra", 2L -> "yak", 3L -> "llama"))
  }

  test("keyTerms ranks within doc by score then term, respects topK") {
    val d = Seq(
      (1L, "aa bb bb"),     // bb tf=2, aa tf=1, same df → bb first
      (2L, "cc")
    ).toDF("doc_id", "text")
    val out = Search.keyTerms(d, "text", "doc_id", topK = 2)
      .select("id", "term", "rank").as[(Long, String, Int)].collect().sorted
    assert(out === Array((1L, "aa", 2), (1L, "bb", 1), (2L, "cc", 1)))
  }
}
