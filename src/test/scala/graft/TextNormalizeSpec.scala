package graft

import org.apache.spark.sql.functions._

import graft.functions.TextNormalize

class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("NFC composes combining sequences") {
    val df = Seq("café", "plain", "Å").toDF("s") // café, plain, Å
    val out = df.select(TextNormalize.nfc(col("s")).as("n"),
      length(col("s")).as("lr"), length(TextNormalize.nfc(col("s"))).as("ln"))
      .collect()
    assert(out(0).getString(0) == "café" && out(0).getInt(1) == 5 && out(0).getInt(2) == 4)
    assert(out(1).getString(0) == "plain" && out(1).getInt(1) == 5 && out(1).getInt(2) == 5)
    assert(out(2).getString(0) == "Å")
  }

  test("NFKC additionally folds compatibility forms") {
    val df = Seq("ﬁle", "x²").toDF("s") // ﬁle (ligature), x²
    val out = df.select(TextNormalize.nfc(col("s")).as("c"),
      TextNormalize.nfkc(col("s")).as("kc")).collect()
    assert(out(0).getString(0) == "ﬁle")   // NFC keeps the ligature
    assert(out(0).getString(1) == "file")        // NFKC folds it
    assert(out(1).getString(1) == "x2")          // superscript folds
  }

  test("null propagates") {
    val df = Seq(Some("a"), None).toDF("s")
    val out = df.select(TextNormalize.nfc(col("s"))).collect()
    assert(out(0).getString(0) == "a" && out(1).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("é ﬁ ẍy", "").toDF("s")
    val cg = df.select(TextNormalize.nfkc(col("s"))).collect().map(_.getString(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(TextNormalize.nfkc(col("s"))).collect().map(_.getString(0))
      assert(cg.toSeq == interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
