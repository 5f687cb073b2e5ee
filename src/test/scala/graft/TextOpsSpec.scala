package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCountWs: whitespace runs, trimming, empty string") {
    val df = Seq("a b  c", "  x ", "", "one").toDF("t")
      .select(TextOps.tokenCountWs(col("t")).as("n"))
    assert(df.as[Int].collect() === Array(3, 1, 0, 1))
  }

  test("wordShingles produces n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(TextOps.wordShingles(col("t"), 3).as("sh"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("charShingles windows characters after whitespace-normalization") {
    val df = Seq("ab  cd").toDF("t").select(TextOps.charShingles(col("t"), 3).as("sh"))
    assert(df.as[Seq[String]].collect()(0) === Seq("ab ", "b c", " cd"))
  }

  test("ratios: alpha/digit/punct over mixed text") {
    val df = Seq("ab1.?").toDF("t").select(
      TextOps.alphaRatio(col("t")).as("a"),
      TextOps.digitRatio(col("t")).as("d"),
      TextOps.punctRatio(col("t")).as("p"))
    val r = df.as[(Double, Double, Double)].collect()(0)
    assert(r._1 === 0.4) // 2 letters / 5
    assert(r._2 === 0.2) // 1 digit / 5
    assert(r._3 === 0.4) // . and ? / 5
  }

  test("stopwordRatio counts lowercase stopword hits") {
    val df = Seq("The cat and the dog").toDF("t")
      .select(TextOps.stopwordRatio(col("t"), TextOps.EnglishStopwords).as("r"))
    assert(df.as[Double].collect()(0) === 0.6) // the, and, the of 5 tokens
  }

  test("langIdGuess picks marker-dense language, und when none") {
    val df = Seq(
      "the cat is on the mat and the dog is here",
      "der hund ist gut und die katze ist da",
      "xyzzy qwerty").toDF("t")
      .select(TextOps.langIdGuess(col("t")).as("l"))
    assert(df.as[String].collect() === Array("en", "de", "und"))
  }

  test("qualityScore: clean prose beats punctuation soup") {
    val good = "the quick brown fox jumps over the lazy dog and keeps running for a while longer"
    val bad = "!!! ??? ,,, ... ;;; ::: !!!"
    val df = Seq(good, bad).toDF("t").select(TextOps.qualityScore(col("t")).as("q"))
    val out = df.as[Double].collect()
    assert(out(0) > 0.8)
    assert(out(1) < 0.3)
  }

  test("tokenCountBpeIsh splits letter/digit/punct runs") {
    val df = Seq("hello world42!").toDF("t")
      .select(TextOps.tokenCountBpeIsh(col("t")).as("n"))
    // hello | world | 42 -> wait: world42 is one alnum run? letters+digits
    // share the class, '!' is its own run -> hello, world42, '!' = 3
    assert(df.as[Int].collect()(0) === 3)
  }

  test("repetitionStats: looping text scores high, varied text low, empty is null") {
    val docs = Seq(
      (1L, "spam spam spam spam"),        // top token 4/4, bigram "spam spam" 3/3, all dups
      (2L, "one two three four five"),    // all unique: top 1/5, bigrams unique
      (3L, "")                            // no tokens -> null fractions
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "text", "doc_id", n = 2)
      .select("id", "top_token_frac", "top_ngram_frac", "dup_ngram_frac")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((Some(1.0), Some(1.0), Some(1.0))))
    assert(out(2L) === ((Some(0.2), Some(0.25), Some(0.0))))
    assert(out(3L) === ((None, None, None)))
  }

  test("redactPii scrubs emails, IPv4s, and phone numbers, leaves prose") {
    val df = Seq(
      "mail bob.smith+x@corp.example.co or call +44 20 7946 0958 from 192.168.1.77 ok")
      .toDF("t").select(TextOps.redactPii(col("t")).as("r"))
    assert(df.as[String].collect()(0) ===
      "mail <EMAIL> or call <PHONE> from <IP> ok")
  }

  test("gopherFilter: each rule fails its crafted offender, clean prose passes") {
    // 60 plain words with stopwords sprinkled in → passes everything
    val good = (1 to 60).map(i =>
      if (i % 5 == 0) "the" else if (i % 7 == 0) "with" else "word" + i).mkString(" ")
    val short = "the quick brown fox with it"               // < 50 words
    val symbols = (1 to 60).map(i =>
      if (i % 5 == 0) "the" else if (i % 7 == 0) "with" else "tag#" + i).mkString(" ")
    val bullets = (1 to 60).map(i =>
      "- " + (if (i % 3 == 0) "the" else if (i % 7 == 0) "with" else "item" + i))
      .mkString("\n")                                       // every line bullet-started
    val nostop = (1 to 60).map("tok" + _).mkString(" ")     // no required stopwords
    val docs = Seq((1L, good), (2L, short), (3L, symbols), (4L, bullets),
      (5L, nostop), (6L, "")).toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs, "text", "doc_id")
      .select("doc_id", "n_words", "symbol_ratio", "bullet_frac", "stop_hits", "passes")
      .as[(Long, Long, Option[Double], Option[Double], Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._6, "clean prose must pass")
    assert(out(2L)._2 < 50 && !out(2L)._6, "short doc fails word count")
    assert(out(3L)._3.get > 0.1 && !out(3L)._6, "hash soup fails symbol ratio")
    assert(out(4L)._4.get >= 0.9 && !out(4L)._6, "bullet list fails bullet fraction")
    assert(out(5L)._5 < 2 && !out(5L)._6, "stopword-free doc fails stop_hits")
    assert(out(6L)._2 === 0L && !out(6L)._6, "empty doc fails with zero words")
  }

  test("gopherFilter metrics: mean word length, ellipsis lines, alpha words") {
    // 3 lines, one ellipsis-ended; 7 words totalling 23 non-space chars
    val t = "aaaa aaaa ...\naaaa aaaa\n12 34"
    val out = TextOps.gopherFilter(Seq((1L, t)).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("n_words", "mean_word_len", "ellipsis_frac", "alpha_word_frac")
      .as[(Long, Double, Double, Double)].collect()(0)
    assert(out._1 === 7L)                        // 4×aaaa + "..." + 12 + 34
    assert(out._2 === 3.285714)                  // round(23/7, 6)
    assert(out._3 === 0.333333)                  // 1 of 3 lines ellipsis-ended
    assert(out._4 === 0.571429)                  // 4 of 7 words have a letter
  }

  test("dedupLines drops cross-doc boilerplate lines, keeps content in order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha content\n\nmore alpha text\nfooter promo"),
      (2L, "COOKIE BANNER\nunique beta content\nfooter promo"),
      (3L, "  COOKIE BANNER  \nunique gamma content"), // trims to the same key
      (4L, "standalone doc with one line")
    ).toDF("doc_id", "text")
    val out = TextOps.dedupLines(docs, "text", "doc_id", maxDf = 1)
      .as[(Long, Long, Long, Option[String])].collect().map(r => r._1 -> r).toMap
    // banner (3 docs) and footer (2 docs) dropped everywhere; blank kept
    assert(out(1L) === ((1L, 5L, 3L, Some("unique alpha content\n\nmore alpha text"))))
    assert(out(2L) === ((2L, 3L, 1L, Some("unique beta content"))))
    assert(out(3L) === ((3L, 2L, 1L, Some("unique gamma content"))))
    assert(out(4L) === ((4L, 1L, 1L, Some("standalone doc with one line"))))
  }

  test("dedupLines: round-trip at high maxDf, null when all content is boilerplate") {
    val docs = Seq(
      (1L, "same line\nsame line2"),
      (2L, "same line\nsame line2"),
      (3L, "same line")
    ).toDF("doc_id", "text")
    // maxDf high: nothing is boilerplate — exact round-trip
    val loose = TextOps.dedupLines(docs, "text", "doc_id", maxDf = 10)
      .as[(Long, Long, Long, Option[String])].collect().map(r => r._1 -> r._4).toMap
    assert(loose === Map(1L -> Some("same line\nsame line2"),
      2L -> Some("same line\nsame line2"), 3L -> Some("same line")))
    // maxDf=1: every line is shared — docs lose ALL lines
    val strict = TextOps.dedupLines(docs, "text", "doc_id", maxDf = 1)
      .as[(Long, Long, Long, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(strict(3L) === ((3L, 1L, 0L, None)))
    // deterministic across partitionings
    val re = TextOps.dedupLines(docs.repartition(4), "text", "doc_id", maxDf = 1)
      .as[(Long, Long, Long, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(re === strict)
  }

  test("compressionRatio orders boilerplate < prose < noise") {
    val rnd = new scala.util.Random(8)
    val docs = Seq(
      (1L, "the same line repeats here\n" * 50),                       // boilerplate
      (2L, "a reasonably varied prose paragraph about spark engines " +
        "discussing partitions shuffles and the optimizer in detail " +
        "with enough distinct words to resist the dictionary" * 3),
      (3L, Seq.fill(1500)(('a' + rnd.nextInt(26)).toChar).mkString),   // noise
      (4L, ""),                                                        // empty -> null ratio
      (5L, null.asInstanceOf[String])                                  // null text
    ).toDF("doc_id", "text")
    val out = TextOps.compressionRatio(docs, "text", "doc_id")
      .as[(Long, Int, Int, Option[Double])].collect().map(r => r._1 -> r).toMap
    val boiler = out(1L)._4.get
    val prose = out(2L)._4.get
    val noise = out(3L)._4.get
    assert(boiler < prose && prose < noise,
      s"expected boiler $boiler < prose $prose < noise $noise")
    assert(noise > 0.5, "random text must barely compress")
    assert(boiler < 0.1, "repeated lines must collapse")
    assert(out(4L)._4.isEmpty && out(4L)._2 === 0)
    assert(out(5L)._4.isEmpty)
    // deterministic across partitionings
    val re = TextOps.compressionRatio(docs.repartition(4), "text", "doc_id")
      .as[(Long, Int, Int, Option[Double])].collect().map(r => r._1 -> r._4).toMap
    assert(re === out.view.mapValues(_._4).toMap)
  }

  test("bigramLogProb: hand-computed MLE, repeated text outscores rare text") {
    // corpus: "a b" x3 docs and one "a c" doc →
    // c(a b)=3, c(a c)=1, c(a·)=4: lp("a b") = ln(3/4), lp("a c") = ln(1/4)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(docs, "text", "doc_id")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.map(_._2) == Seq(1L, 1L, 1L, 1L))
    assert(out(0)._3 == r6(math.rint(math.log(3.0 / 4) * 1e9) / 1e9))
    assert(out(3)._3 == r6(math.rint(math.log(1.0 / 4) * 1e9) / 1e9))
    assert(out(0)._3 > out(3)._3) // common transition scores higher
  }

  test("chunkTokens: boundaries, overlap, tail clamp, degenerate docs") {
    // 10 tokens t0..t9, chunk 4, overlap 1 → stride 3:
    // starts 0,3,6 cover through t9 (start 6 + 4 = 10); K = 1+ceil(6/3) = 3
    val docs = Seq(
      (1L, (0 until 10).map("t" + _).mkString(" ")),
      (2L, "a b"),          // shorter than one chunk → single short chunk
      (3L, "   "),          // whitespace-only → dropped
      (4L, "")              // empty → dropped
    ).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "text", "doc_id", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),   // t3 overlaps
      (1L, 2L, 4L, "t6 t7 t8 t9"),   // t6 overlaps, exact cover
      (2L, 0L, 2L, "a b")))
  }

  test("chunkTokens property: dropping each chunk's first `overlap` tokens " +
      "(after chunk 0) reconstructs the document exactly") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 30) {
      val n = 1 + rnd.nextInt(60)
      val chunk = 2 + rnd.nextInt(10)
      val overlap = rnd.nextInt(chunk) // 0 until chunk
      val toks = (0 until n).map("t" + _)
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextOps.chunkTokens(docs, "text", "doc_id", chunk, overlap)
        .orderBy("chunk_id").as[(Long, Long, Long, String)].collect()
      val rebuilt = chunks.zipWithIndex.flatMap { case ((_, _, _, txt), i) =>
        val ws = txt.split(" ").toSeq
        if (i == 0) ws else ws.drop(overlap)
      }
      assert(rebuilt.toSeq == toks,
        s"n=$n chunk=$chunk overlap=$overlap: reconstruction diverged")
    }
  }

  test("chunkTokens: zero overlap partitions exactly, tail is short") {
    val docs = Seq((1L, (0 until 7).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(docs, "text", "doc_id", chunkTokens = 3, overlap = 0)
      .orderBy("chunk_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(_._4) == Seq("w0 w1 w2", "w3 w4 w5", "w6"))
    assert(out.map(_._3) == Seq(3L, 3L, 1L))
  }

  test("bpePairCounts: hand-counted adjacent pairs, single-char words drop, topK caps") {
    // words: abab (ab, ba, ab), ab (ab), x (dropped) -> ab:3, ba:1
    val docs = Seq((1L, "ABab ab x"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(docs, "text", topK = 10)
      .orderBy("rank").as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("ab", 3L, 1), ("ba", 1L, 2)))
    // topK caps and rank follows (cnt DESC, pair ASC)
    val capped = TextOps.bpePairCounts(docs, "text", topK = 1)
      .as[(String, Long, Int)].collect().toSeq
    assert(capped == Seq(("ab", 3L, 1)))
  }
}
