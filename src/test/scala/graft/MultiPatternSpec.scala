package graft

import org.apache.spark.sql.functions._
import graft.functions.MultiPattern

/** Aho–Corasick dictionary matching ([[graft.functions.AhoCorasickMatches]]):
  * the classic overlapping-suffix example plus edge shapes, exercised
  * through the DataFrame (codegen) path.
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq("he", "she", "his", "hers")

  test("classic he/she/his/hers overlapping matches") {
    val rows = Seq(
      (1L, "ushers"),   // she, he (inside "ushers"), hers — NOT his
      (2L, "this"),     // his only
      (3L, "ahishers"), // all four: his, she?? -> his, he, hers, she? "ahishers": a-h-i-s-h-e-r-s: his, she(no: s-h-e at 3..5 "she" yes), he, hers
      (4L, "xyz"),      // none
      (5L, "")          // empty text
    ).toDF("id", "t")
    val got = rows.select(col("id"),
        array_join(MultiPattern.acMatches(col("t"), dict), "|").as("m"))
      .orderBy("id").collect().map(_.getString(1))
    assert(got(0) == "he|hers|she")
    assert(got(1) == "his")
    assert(got(2) == "he|hers|his|she")
    assert(got(3) == "")
    assert(got(4) == "")
  }

  test("multi-word phrases match across spaces; duplicates collapse") {
    val rows = Seq((1L, "a table part and a table part again")).toDF("id", "t")
    val got = rows.select(array_join(
        MultiPattern.acMatches(col("t"), Seq("table part", "part a", "never")),
        "|")).collect()(0).getString(0)
    assert(got == "part a|table part") // each phrase once, sorted
  }

  test("empty phrases are ignored; null text yields null") {
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, "ab")).toDF("id", "t")
    val got = rows.select(col("id"),
        MultiPattern.acMatches(col("t"), Seq("", "ab")).as("m"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getSeq[String](1) == Seq("ab"))
  }
}
