package graft

import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity.{damerauLevenshtein, jaroWinkler}

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).as[Double].collect()(0)

  private def dl(a: String, b: String): Int =
    Seq((a, b)).toDF("a", "b")
      .select(damerauLevenshtein(col("a"), col("b"))).as[Int].collect()(0)

  test("jaroWinkler: textbook values (Winkler 1990 examples)") {
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334) // no common prefix
  }

  test("jaroWinkler: identical, disjoint, empty") {
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("", "") === 0.0)   // DuckDB convention: empty is NO match
    assert(jw("a", "") === 0.0)
    assert(jw("a", "b") === 0.0) // window 0, no match
    assert(jw("a", "a") === 1.0)
  }

  test("jaroWinkler: prefix boost gated on jaro > 0.7") {
    // jaro = 0.4667 with a 2-byte common prefix: boost must NOT apply
    assert(jw("abcdefghij", "abzzzzzzzz") === 0.4666666666666666)
    // jaro = 0.7778 with a 4-byte prefix: boost applies, capped at 4
    assert(jw("abcdef", "abcdxy") === 0.8666666666666666)
  }

  test("jaroWinkler: byte semantics on multi-byte text (DuckDB parity)") {
    // 'café' is 5 UTF-8 bytes; a codepoint kernel would say 0.8833
    assert(jw("café", "cafe") === 0.8483333333333334)
  }

  test("damerauLevenshtein: unrestricted variant (ca→abc is 2, not OSA's 3)") {
    assert(dl("ca", "abc") === 2)
    assert(dl("abcdef", "abcfed") === 2)
    assert(dl("MARTHA", "MARHTA") === 1) // one adjacent transposition
  }

  test("damerauLevenshtein: degenerate and classic cases") {
    assert(dl("", "") === 0)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("kitten", "sitting") === 3) // pure Levenshtein case
    assert(dl("abc", "abc") === 0)
  }

  test("kernels survive codegen over a real column (not just literals)") {
    val df = Seq(("Supplier#1", "Supplier#1x"), ("alpha", "aplha"))
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"),
        damerauLevenshtein(col("a"), col("b")).as("dl"))
    val rows = df.as[(Double, Int)].collect()
    assert(rows(1)._2 === 1) // one transposition
    assert(rows(0)._2 === 1) // one append
    assert(rows.forall(r => r._1 > 0.8 && r._1 <= 1.0))
  }
}
