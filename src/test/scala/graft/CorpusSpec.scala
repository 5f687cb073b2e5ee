package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "a completely unrelated document about spark engines here"),
    (3L, "xx yy the quick brown fox jumps zz ww qq"), // shares a 5-gram with bench
    (4L, "short doc")
  ).toDF("doc_id", "text")

  private def benchmark = Seq(
    (100L, "the quick brown fox jumps over fences")
  ).toDF("doc_id", "text")

  test("decontaminate removes docs sharing an n-gram with the benchmark") {
    val clean = Corpus.decontaminate(corpus, benchmark, "text", "doc_id", n = 5)
    // docs 1 and 3 share "the quick brown fox jumps"; 4 is too short to
    // have any 5-gram; 2 shares nothing
    assert(clean.select("doc_id").as[Long].collect().sorted === Array(2L, 4L))
  }

  test("decontaminateSemantic flags near-parallel embeddings, spares orthogonal ones") {
    val corpusE = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // parallel to bench 100 -> flagged
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal -> clean
      (3L, Array(0.9f, 0.1f, 0.0f)),   // near-parallel -> flagged
      (4L, Array(-1.0f, 0.0f, 0.0f))   // anti-parallel (cos -1) -> clean
    ).toDF("vec_id", "embedding")
    val benchE = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.ext.Corpus.decontaminateSemantic(
        corpusE, benchE, "embedding", "vec_id", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L))
  }

  test("contaminationReport counts overlapping n-grams per doc") {
    val rep = Corpus.contaminationReport(corpus, benchmark, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(rep.keySet === Set(1L, 3L))
    assert(rep(1L) === 2L) // "the quick brown fox jumps", "quick brown fox jumps over"
    assert(rep(3L) === 1L)
  }

  test("deterministicSample is reproducible and respects the fraction roughly") {
    val big = (1 to 10000).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val s1 = Corpus.deterministicSample(big, "doc_id", 0.3, seed = 9L)
      .select("doc_id").as[Long].collect().sorted
    val s2 = Corpus.deterministicSample(big, "doc_id", 0.3, seed = 9L)
      .select("doc_id").as[Long].collect().sorted
    assert(s1 === s2) // bit-reproducible
    assert(math.abs(s1.length - 3000) < 200, s"got ${s1.length} of ~3000")
    // different seed -> different sample
    val s3 = Corpus.deterministicSample(big, "doc_id", 0.3, seed = 10L)
      .select("doc_id").as[Long].collect().sorted
    assert(!(s3 === s1))
  }

  test("tokenBudgetSample: exact cutoff per stratum, deterministic, unlisted drop") {
    import org.apache.spark.sql.functions._
    // every doc contributes exactly 10 tokens, so budgets translate to
    // exact doc counts: en 50 tokens -> 5 docs, de 20 -> 2 docs
    val df = (1 to 300).map(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3), (1 to 10).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val toks = graft.ext.TextOps.tokenCountWs(col("text"))
    val out = Corpus.tokenBudgetSample(df, "doc_id", "lang", toks,
      Map("en" -> 50L, "de" -> 20L), seed = 7L)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts === Map("en" -> 5L, "de" -> 2L)) // fr dropped entirely
    // reproducible: same seed -> same docs
    val again = Corpus.tokenBudgetSample(df, "doc_id", "lang", toks,
      Map("en" -> 50L, "de" -> 20L), seed = 7L)
      .select("doc_id").as[Long].collect().sorted
    assert(again === out.select("doc_id").as[Long].collect().sorted)
  }

  test("tokenBudgetSample drops zero-token docs from unlisted strata") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "en", "a b c"),
      (2L, "fr", ""),       // zero tokens, unlisted stratum — must drop
      (3L, "fr", "x y")
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.tokenBudgetSample(df, "doc_id", "lang",
        graft.ext.TextOps.tokenCountWs(col("text")), Map("en" -> 10L), seed = 7L)
      .select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L))
  }

  test("packingOffsets: contiguous offsets per bucket, stable bins, deterministic") {
    import org.apache.spark.sql.functions._
    val df = (1 to 500).map(i => (i.toLong, (1 to 10).mkString(" ")))
      .toDF("doc_id", "text") // 10 tokens each
    val toks = graft.ext.TextOps.tokenCountWs(col("text"))
    val out = Corpus.packingOffsets(df, "doc_id", toks, binTokens = 64, nBuckets = 4, seed = 7L)
      .select("doc_id", "pack_bucket", "pack_offset", "bin_id")
      .as[(Long, Long, Long, Long)].collect()
    // per bucket: offsets are exactly 0, 10, 20, ... (contiguous concatenation)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val offs = rows.map(_._3).sorted
      assert(offs === offs.indices.map(_ * 10L).toArray)
    }
    // bin = floor(offset / 64)
    assert(out.forall(r => r._4 === r._3 / 64))
    // deterministic across runs
    val again = Corpus.packingOffsets(df, "doc_id", toks, binTokens = 64, nBuckets = 4, seed = 7L)
      .select("doc_id", "pack_offset").as[(Long, Long)].collect().sortBy(_._1)
    assert(again === out.map(r => (r._1, r._3)).sortBy(_._1))
  }

  test("stratifiedSample applies per-stratum fractions; unlisted strata drop") {
    val df = (1 to 3000).map(i =>
      (i.toLong, Seq("en", "de", "fr")(i % 3))).toDF("doc_id", "lang")
    val out = Corpus.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.8, "de" -> 0.1), seed = 3L)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("fr"))
    assert(math.abs(counts("en") - 800) < 120)
    assert(math.abs(counts("de") - 100) < 60)
  }

  test("unigramLogProb: common prose scores above rare-token soup, empty is null") {
    val docs = Seq(
      (1L, "a a b"),     // a:2/4, b:1/4 → mean (ln .5 + ln .5 + ln .25)/3
      (2L, "c"),         // c:1/4 → ln .25
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(docs, "text", "doc_id")
      .select("id", "n_tokens", "mean_lnp")
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._2 === 3L)
    assert(out(1L)._3.exists(v => math.abs(v - r6((2 * math.log(0.5) + math.log(0.25)) / 3)) < 2e-6))
    assert(out(2L)._3.exists(v => math.abs(v - r6(math.log(0.25))) < 2e-6))
    assert(out(3L) === ((3L, 0L, None)))
    assert(out(1L)._3.get > out(2L)._3.get, "common tokens must score higher")
  }

  test("vocabulary: rank by count then word, cumulative coverage, topK cut") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a B d")).toDF("doc_id", "text")   // a:3 b:4(lowercased) c:1 d:1
    val out = Corpus.vocabulary(docs, "text", topK = 3)
      .select("word", "cnt", "rank", "cum_frac")
      .as[(String, Long, Int, Double)].collect().sortBy(_._3)
    // 9 tokens total; b(4) > a(3) > c(1)=d(1) tie → c first by word
    assert(out === Array(
      ("b", 4L, 1, 0.444444),
      ("a", 3L, 2, 0.777778),
      ("c", 1L, 3, 0.888889)))
  }

  test("assignSplit: exhaustive, deterministic, near-requested fractions") {
    val docs = spark.range(10000).toDF("id")
    val out = Corpus.assignSplit(docs, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 10000L)
    assert(math.abs(out("train") - 8000.0) < 300, out.toString)
    assert(math.abs(out("val") - 1000.0) < 150, out.toString)
    assert(math.abs(out("test") - 1000.0) < 150, out.toString)
    // determinism: identical mapping on re-run
    val a = Corpus.assignSplit(docs, "id").orderBy("id").collect().map(_.getString(1))
    val b = Corpus.assignSplit(docs.repartition(7), "id").orderBy("id").collect().map(_.getString(1))
    assert(a.toSeq == b.toSeq)
  }

  test("assignSplit is stable under corpus growth") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val s = Corpus.assignSplit(small, "id").orderBy("id").collect().map(_.getString(1))
    val g = Corpus.assignSplit(big, "id").filter(col("id") < 1000)
      .orderBy("id").collect().map(_.getString(1))
    assert(s.toSeq == g.toSeq) // adding docs never moves an existing one
  }

  test("assignSplit rejects fractions that don't sum to 1") {
    val docs = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Corpus.assignSplit(docs, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("pplBuckets: tercile split by unigram quality, empty doc keeps a null-bucket row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one token type per doc, corpus freqs 12/6/3 -> three distinct
    // mean-lnp levels; ascending terciles: rare=tail, mid=middle,
    // common=head (higher mean ln p == lower perplexity == head)
    val docs = (
      (0 to 2).map(i => (i.toLong, "z z z z")) ++
      (3 to 5).map(i => (i.toLong, "m m")) ++
      (6 to 8).map(i => (i.toLong, "r")) ++
      Seq((9L, ""))
    ).toDF("doc_id", "text")
    val got = graft.ext.Corpus.pplBuckets(docs, "text", "doc_id")
      .orderBy("id").collect()
    val buckets = got.map(r => if (r.isNullAt(3)) null else r.getString(3))
    assert(buckets.toSeq == Seq("head", "head", "head",
      "middle", "middle", "middle", "tail", "tail", "tail", null))
    assert(got(9).getLong(1) == 0L && got(9).isNullAt(2))
    // deterministic under repartitioning
    val b2 = graft.ext.Corpus.pplBuckets(docs.repartition(5), "text", "doc_id")
      .orderBy("id").collect().map(r => if (r.isNullAt(3)) null else r.getString(3))
    assert(b2.toSeq == buckets.toSeq)
  }

  test("pplBucketsBy: terciles computed independently per group") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // lang A reuses the global fixture's three levels; lang B is one
    // uniform level (every B doc <= its own t33 -> all tail)
    val docs = (
      (0 to 2).map(i => (i.toLong, "z z z z", "A")) ++
      (3 to 5).map(i => (i.toLong, "m m", "A")) ++
      (6 to 8).map(i => (i.toLong, "r", "A")) ++
      (9 to 11).map(i => (i.toLong, "q q q", "B"))
    ).toDF("doc_id", "text", "lang")
    val got = graft.ext.Corpus.pplBucketsBy(docs, "text", "doc_id", "lang")
      .orderBy("id").collect()
    val buckets = got.map(_.getString(4))
    assert(buckets.toSeq == Seq("head", "head", "head",
      "middle", "middle", "middle", "tail", "tail", "tail",
      "tail", "tail", "tail"))
    assert(got.forall(r => r.getString(1) == (if (r.getLong(0) < 9) "A" else "B")))
  }

  test("termDivergence: hand-computed JS, identical corpora, disjoint vocab") {
    import spark.implicits._
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x z")).toDF("doc_id", "text")
    val r = graft.ext.Corpus.termDivergence(a, b, "text").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 3L && r.getLong(4) == 2L)
    // x: p=2/3,q=1/2; y: p=1/3,q=0; z: q=1/2
    val raw = (2.0 / 3 * math.log(2 * (2.0 / 3) / (2.0 / 3 + 0.5))
      + 0.5 * math.log(2 * 0.5 / (2.0 / 3 + 0.5))
      + 1.0 / 3 * math.log(2.0) + 0.5 * math.log(2.0)) / 2
    assert(math.abs(r.getDouble(5) - raw) < 2e-6)

    // identical corpora: js exactly 0
    val same = graft.ext.Corpus.termDivergence(a, a, "text").collect()(0)
    assert(same.getDouble(5) == 0.0 && same.getLong(2) == 2L)

    // fully disjoint vocab: js = ln 2
    val c = Seq((3L, "p q")).toDF("doc_id", "text")
    val dis = graft.ext.Corpus.termDivergence(a, c, "text").collect()(0)
    assert(dis.getLong(2) == 0L &&
      math.abs(dis.getDouble(5) - math.log(2.0)) < 2e-6)
  }

  test("termDivergenceBySource: matches pairwise JS of source vs rest") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y", "s1"), (2L, "x z", "s2"), (3L, "x z z", "s2")
    ).toDF("doc_id", "text", "source")
    val sweep = graft.ext.Corpus.termDivergenceBySource(docs, "text", "source")
      .collect()
    assert(sweep.map(_.getString(0)).toSeq.sorted == Seq("s1", "s2"))
    // each source's js must equal the two-corpus primitive on the
    // same split (the sweep is just the vectorized form)
    for (src <- Seq("s1", "s2")) {
      val ref = graft.ext.Corpus.termDivergence(
        docs.filter(col("source") === src),
        docs.filter(col("source") =!= src), "text").collect()(0).getDouble(5)
      val got = sweep.find(_.getString(0) == src).get.getDouble(3)
      assert(math.abs(got - ref) < 2e-6, s"$src: sweep $got vs pairwise $ref")
    }
    // single source: no rest, js null
    val one = graft.ext.Corpus.termDivergenceBySource(
      docs.filter(col("source") === "s1"), "text", "source").collect()(0)
    assert(one.isNullAt(3))
  }

  test("labelDiversity: uniform-two gives ln 2 and effective 2, constant gives 0/1") {
    import spark.implicits._
    val docs = Seq(
      ("A", "en"), ("A", "en"), ("A", "de"), ("A", "de"),
      ("B", "en"), ("B", "en"), ("B", "en")
    ).toDF("source", "lang")
    val got = graft.ext.Corpus.labelDiversity(docs, "source", "lang")
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(got(0).getLong(1) == 4L && got(0).getLong(2) == 2L)
    assert(got(0).getDouble(3) == 0.693147 && got(0).getDouble(4) == 2.0)
    assert(got(1).getLong(2) == 1L && got(1).getDouble(3) == 0.0 &&
      got(1).getDouble(4) == 1.0)
  }

  test("datasheet: hand-computed totals, composition, percentiles") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "a b", "en", "s0"),     // 3 chars, 2 tokens
      (1L, "abcde", "en", "s0"),   // 5 chars, 1 token
      (2L, "x y z w", "de", "s1"), // 7 chars, 4 tokens
      (3L, "", "de", "s1")         // 0 chars, 0 tokens
    ).toDF("doc_id", "text", "lang", "source")
    val rows = Corpus.datasheet(docs, "text", "doc_id", "lang", "source")
      .orderBy("section", "key").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(rows(("corpus", "n_docs")) == ((4L, None)))
    assert(rows(("corpus", "n_chars")) == ((15L, None)))
    assert(rows(("corpus", "n_tokens_ws")) == ((7L, None)))
    assert(rows(("lang", "en")) == ((2L, Some(0.5))))
    assert(rows(("source", "s1")) == ((2L, Some(0.5))))
    // ascending lens 0,3,5,7: p25->rank ceil(1)=1 -> 0; p50->rank 2 -> 3;
    // p75->rank 3 -> 5; p95->rank ceil(3.8)=4 -> 7
    assert(rows(("length_chars", "p25"))._1 == 0L)
    assert(rows(("length_chars", "p50"))._1 == 3L)
    assert(rows(("length_chars", "p75"))._1 == 5L)
    assert(rows(("length_chars", "p95"))._1 == 7L)
    assert(rows.size == 3 + 2 + 2 + 4)
  }

  test("concentration: hand-computed Lorenz points and Gini") {
    val df = Seq(("a", 1L), ("b", 1L), ("c", 2L), ("d", 4L)).toDF("src", "m")
    val out = Corpus.concentration(df, "src", "m")
      .select("key", "rank", "cum_share", "gini").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)))
    // cum shares 1/8, 2/8, 4/8, 8/8
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.125, 0.25, 0.5, 1.0))
    // gnum = -3·1 + -1·1 + 1·2 + 3·4 = 10; gini = 10/(4·8)
    assert(out.forall(_.getDouble(3) === 0.3125))
  }

  test("collocations: hand-computed PMI with deterministic tie order") {
    // tokens a,b,a,b,a,c: c_a=3 c_b=2 c_c=1, N_u=6; bigrams (a,b)×2,
    // (a,c)×1, N_bi=3. PMI(a,b)=ln(2·36/(3·3·2))=ln 4 = PMI(a,c)
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val out = Corpus.collocations(docs, "text", topK = 10, minCount = 1)
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("a", "b", 2L), ("a", "c", 1L)))
    assert(out.forall(r => r.getDouble(5) === 1.386294)) // round(ln 4, 6)
  }

  test("collocations: minCount prunes hapax pairs, topK caps") {
    val docs = Seq("x y", "p q", "p q").toDF("text")
    val out = Corpus.collocations(docs, "text", topK = 10, minCount = 2)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(out === Seq(("p", "q"))) // (x,y) is a hapax: pruned
  }

  test("lengthBatches: per-shard length-sorted cuts and padding waste") {
    val df = Seq(("A", 1L, 5L), ("A", 2L, 1L), ("A", 3L, 3L), ("A", 4L, 2L),
      ("B", 5L, 7L)).toDF("src", "id", "len")
    val out = Corpus.lengthBatches(df, "src", "id", "len", batchSize = 2)
      .collect()
    // shard A sorted lens (1,2),(3,5); shard B (7)
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("A", 0L, 2L), ("A", 1L, 2L), ("B", 0L, 1L)))
    assert(out(0).getDouble(6) === 0.25) // 1 - 3/(2*2)
    assert(out(1).getDouble(6) === 1 - 8.0 / 10.0)
    assert(out(2).getDouble(6) === 0.0) // singleton batch pads nothing
  }

  test("concentration: uniform masses score Gini 0") {
    val df = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("src", "m")
    val g = Corpus.concentration(df, "src", "m").select("gini")
      .as[Double].collect()
    assert(g.forall(_ === 0.0))
  }

  test("splitAudit: group-keyed assignment is leak-free, row-keyed is not") {
    val docs = Seq((1L, "h1"), (2L, "h1"), (3L, "h2"), (4L, "h2"), (5L, "h3"))
      .toDF("id", "host")
    // group-keyed: every host's rows share a split -> 0 leaked
    val clean = Corpus.assignSplit(docs, "host")
    val auditClean = Corpus.splitAudit(clean, "host", "split").collect()
    assert(auditClean.forall(_.getLong(3) === 0L))
    assert(auditClean.map(_.getLong(1)).sum === 5L)   // all rows accounted
    // a hand-built straddling assignment: h1 split across train/test
    val leaky = Seq((1L, "h1", "train"), (2L, "h1", "test"),
      (3L, "h2", "train")).toDF("id", "host", "split")
    val auditLeaky = Corpus.splitAudit(leaky, "host", "split").collect()
    assert(auditLeaky.forall(_.getLong(3) === 1L))
  }

  test("splitAudit: per-split group counts are observed distincts") {
    val df = Seq((1L, "g1", "train"), (2L, "g1", "train"),
      (3L, "g2", "train"), (4L, "g3", "test")).toDF("id", "g", "split")
    val out = Corpus.splitAudit(df, "g", "split").orderBy("split").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("test", 1L, 1L), ("train", 3L, 2L)))
  }
}
