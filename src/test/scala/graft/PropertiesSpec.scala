package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.ops.{Flatten, Upsert}
import graft.ext.TextOps

/** ScalaCheck properties (SURVEY.md §5.2 item 3), run through the raw
  * scalacheck runner (the scalatestplus bridge isn't on the offline
  * classpath). Each property round-trips through real Spark jobs, so
  * trial counts are kept small and the seed fixed for reproducibility.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withInitialSeed(Seed(42L))
    .withMaxSize(12)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  private val rowGen = for {
    id <- Gen.choose(1, 8)
    v <- Gen.choose(0, 100)
  } yield (id, v)

  // ---- alignment/matching kernels: checked directly against naive
  // reference implementations (pure kernels — no Spark job per trial,
  // so the trial count can be much higher than the job-driven props)

  private val kernelParams = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(Seed(42L))
    .withMaxSize(30)

  private def checkK(name: String, prop: Prop): Unit = {
    val res = SCTest.check(kernelParams, prop)
    assert(res.passed, s"$name: $res")
  }

  private def arr(toks: Seq[String]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any))

  private val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c"))

  private def naiveLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def naiveSw(a: Seq[String], b: Seq[String]): Int = {
    var best = 0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val s = if (a(i - 1) == b(j - 1)) 2 else -1
      dp(i)(j) = math.max(0, math.max(dp(i - 1)(j - 1) + s,
        math.max(dp(i - 1)(j) - 1, dp(i)(j - 1) - 1)))
      if (dp(i)(j) > best) best = dp(i)(j)
    }
    best
  }

  test("property: LcsLength == full-matrix reference; symmetric; bounded; self = |a|") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val k = graft.functions.LcsLength(Literal("x"), Literal("x"))
    checkK("lcs", Prop.forAll(tokGen, tokGen) { (a, b) =>
      val got = k.lcs(arr(a), arr(b))
      got == naiveLcs(a, b) &&
        got == k.lcs(arr(b), arr(a)) &&
        got <= math.min(a.length, b.length) &&
        k.lcs(arr(a), arr(a)) == a.length
    })
  }

  test("property: SwScore == full-matrix reference; self = 2|a|; nonneg") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val k = graft.functions.SwScore(Literal("x"), Literal("x"), 2, -1, -1)
    checkK("sw", Prop.forAll(tokGen, tokGen) { (a, b) =>
      val got = k.sw(arr(a), arr(b))
      got == naiveSw(a, b) && got >= 0 &&
        k.sw(arr(a), arr(a)) == 2 * a.length
    })
  }

  test("property: AhoCorasick matches == naive contains filter, any dict") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val strGen = Gen.listOf(Gen.oneOf('a', 'b')).map(_.mkString)
    checkK("ac", Prop.forAll(strGen, Gen.listOf(strGen)) { (text, dict0) =>
      val dict = dict0.distinct
      val k = graft.functions.AhoCorasickMatches(Literal("x"),
        spark.sparkContext.broadcast(dict.toArray))
      val got = k.matchesFor(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val want = dict.filter(p => p.nonEmpty && text.contains(p)).sorted
      got == want
    })
  }

  test("property: upsert idempotence — upsert(upsert(t,u),u) == upsert(t,u)") {
    check("idempotence", Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (t0, u0) =>
      val t = t0.distinctBy(_._1).toDF("id", "v")
      val u = u0.distinctBy(_._1).toDF("id", "v")
      val once = Upsert.upsert(t, u, Seq("id")).orderBy("id", "v").collect()
      val twice = Upsert.upsert(Upsert.upsert(t, u, Seq("id")), u, Seq("id"))
        .orderBy("id", "v").collect()
      once.sameElements(twice)
    })
  }

  test("property: post-upsert keys are unique and updates always win") {
    check("source-wins", Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (t0, u0) =>
      val t = t0.distinctBy(_._1).toDF("id", "v")
      val uRows = u0.distinctBy(_._1)
      val u = uRows.toDF("id", "v")
      val out = Upsert.upsert(t, u, Seq("id")).as[(Int, Int)].collect()
      val keysUnique = out.map(_._1).distinct.length == out.length
      val outMap = out.toMap
      keysUnique && uRows.forall { case (k, v) => outMap(k) == v }
    })
  }

  test("property: flatten row count equals sum of child array sizes") {
    check("flatten-count", Prop.forAll(Gen.listOf(rowGen)) { child0 =>
      val parents = (1 to 8).map(i => (i, s"p$i")).toDF("id", "name")
      val child = child0.zipWithIndex.map { case ((pid, v), i) => (pid, i, v) }
        .toDF("pid", "cid", "v")
      val nested = Flatten.nestChild(parents, child, "id", "pid", "kids")
      val flat = Flatten.explodeChild(nested, "kids", Seq("id" -> "pid"))
      flat.count() == child0.length.toLong
    })
  }

  test("property: wordShingles count == max(0, tokens - n + 1)") {
    val textGen = Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta"))
      .map(_.mkString(" "))
    check("shingles", Prop.forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val tokens = text.split("\\s+").count(_.nonEmpty)
      val out = Seq(text).toDF("t")
        .select(TextOps.wordShingles(col("t"), n).as("sh"))
        .select(size(col("sh"))).as[Int].collect()(0)
      out == math.max(0, tokens - n + 1)
    })
  }

  test("property: shingleHashes == fnv1a64 over wordShingles, elementwise") {
    // the single-pass ShingleFnv kernel must be bit-identical to the
    // composable string pipeline it replaces — including whitespace
    // runs, leading/trailing whitespace, unicode, and empty strings
    val wordGen = Gen.oneOf("alpha", "beta", "γάμμα", "δ", "x", "", " ", "\t")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check("shingle-fnv-equiv", Prop.forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val Array(fast, slow) = Seq(text).toDF("t")
        .select(
          TextOps.shingleHashes(col("t"), n).as("fast"),
          transform(TextOps.wordShingles(col("t"), n),
            s => graft.functions.VectorExpressions.fnv1a64(s)).as("slow"))
        .selectExpr("cast(fast as array<bigint>)", "cast(slow as array<bigint>)")
        .as[(Seq[Long], Seq[Long])].collect()
        .flatMap(r => Array(r._1, r._2))
      fast == slow
    })
  }

  test("property: dedupLines == driver reference on random corpora") {
    // docs of 0-6 lines drawn from a small line pool (forcing cross-doc
    // repeats), plus blanks/whitespace: the Spark operator must agree
    // with a direct driver implementation of the contract — lines kept
    // iff blank OR trimmed-form df <= maxDf, rebuilt in order, null
    // when nothing survives
    val lineGen = Gen.oneOf("shared nav", "shared footer", "alpha", "beta",
      "gamma one", "", "  ", "\t", "\tdelta")
    val docGen = Gen.listOfN(4, Gen.zip(Gen.choose(1L, 6L), Gen.listOf(lineGen)))
    // the driver reference must use SPARK's trim semantics (ASCII space
    // only — matching DuckDB's default trim, which is why the operator
    // keys on it); Java String.trim strips every char <= U+0020, so a
    // "\t" line would be blank to Java but content to the engine
    def sparkTrim(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    check("dedup-lines-vs-driver", Prop.forAll(docGen, Gen.choose(1, 2)) { (docs0, maxDf) =>
      val docs = docs0.zipWithIndex.map { case ((_, ls), i) => (i.toLong, ls.mkString("\n")) }
      val expected = {
        val lines = docs.map { case (id, t) => id -> t.split("\n", -1).toSeq }
        val df = lines.flatMap { case (id, ls) =>
          ls.map(sparkTrim).filter(_.nonEmpty).distinct.map(_ -> id)
        }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
        lines.map { case (id, ls) =>
          val kept = ls.filter(l => sparkTrim(l).isEmpty || df(sparkTrim(l)) <= maxDf)
          id -> ((id, ls.size.toLong, kept.size.toLong,
            if (kept.isEmpty) None else Some(kept.mkString("\n"))))
        }.toMap
      }
      val got = TextOps.dedupLines(docs.toDF("doc_id", "text"), "text", "doc_id", maxDf)
        .as[(Long, Long, Long, Option[String])].collect()
        .map(r => r._1 -> ((r._1, r._2, r._3, r._4))).toMap
      got == expected
    })
  }

  test("property: connectedComponents == driver union-find on random graphs") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 20L)))
    check("cc-vs-union-find", Prop.forAll(edgeGen) { edges0 =>
      val nodes = (1L to 20L).toList
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges0.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to the component MINIMUM (union-by-min above keeps
      // roots minimal, so find() lands on the min id)
      val expected = nodes.map(n => n -> find(n)).toMap
      val edges = if (edges0.isEmpty) Seq((1L, 1L)) else edges0
      val got = graft.ext.Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), nodes.toDF("id"))
        .as[(Long, Long)].collect().toMap
      got == expected
    })
  }

  test("property: asofBackward payload ts never exceeds the left ts") {
    val tsGen = Gen.choose(0L, 100L)
    check("asof-invariant", Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(1, 3), tsGen)),
      Gen.listOf(Gen.zip(Gen.choose(1, 3), tsGen))) { (l0, r0) =>
      val l = l0.distinct.map { case (k, t) => (k, t) }.toDF("k", "lt")
      val r = r0.distinct.map { case (k, t) => (k, t, t) }.toDF("k", "rt", "rts_payload")
        .dropDuplicates("k", "rt")
      val out = graft.ops.AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("rts_payload"))
        .as[(Int, Long, Option[Long])].collect()
      // every matched payload carries a right-ts <= left-ts, and it is
      // the LATEST such right ts for that key
      out.forall { case (k, lt, p) =>
        val eligible = r0.distinct.filter { case (rk, rt) => rk == k && rt <= lt }
        p match {
          case None => eligible.isEmpty
          case Some(v) => eligible.nonEmpty && v == eligible.map(_._2).max
        }
      }
    })
  }

  test("property: decontaminate output shares no n-gram with the benchmark") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val textGen = Gen.listOfN(6, word).map(_.mkString(" "))
    check("decontaminate", Prop.forAll(
      Gen.listOf(textGen), Gen.listOf(textGen)) { (corpus0, bench0) =>
      val corpus = corpus0.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bench = bench0.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val clean = graft.ext.Corpus.decontaminate(corpus, bench, "text", "doc_id", n = 3)
        .as[(Long, String)].collect()
      def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val benchGrams = bench0.flatMap(grams).toSet
      clean.forall { case (_, t) => grams(t).intersect(benchGrams).isEmpty }
    })
  }

  test("property: fnv1a64 matches an independent reference implementation") {
    def refFnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        h = (h ^ (b & 0xffL)) * 0x100000001b3L
      h
    }
    check("fnv1a64-ref", Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { ss =>
      val rows = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      rows.isEmpty || {
        val out = rows.toDF("id", "s")
          .select(col("id"), graft.functions.VectorExpressions.fnv1a64(col("s")).as("h"))
          .as[(Long, Long)].collect().toMap
        rows.forall { case (i, s) => out(i) == refFnv(s) }
      }
    })
  }

  test("property: bucketed near-dup pairs are a subset of exact pairs with equal cosines") {
    val vecGen = Gen.listOfN(8, Gen.choose(-1.0f, 1.0f))
    check("bucketed-subset", Prop.forAll(Gen.listOfN(24, vecGen)) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val df = rows.toDF("vec_id", "embedding")
      val exact = graft.ext.Dedup.embeddingNearDups(df, "embedding", "vec_id", 0.8)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val bucketed = graft.ext.Dedup.embeddingNearDupsBucketed(df, "embedding", "vec_id",
          0.8, nCells = 4, nProbe = 2)
        .as[(Long, Long, Double)].collect()
      bucketed.forall { case (a, b, c) => exact.get((a, b)).contains(c) }
    })
  }

  test("property: resample spine is gapless per key and means replay the integer formula") {
    // targets the r8/r9 breakage family: whatever the input distribution,
    // the resampled grid per key must (a) run contiguously in step
    // multiples from the key's first to last observed slot, (b) account
    // for every input row in the n column with n=0 exactly on null-mean
    // gap slots, and (c) produce means equal to the half-away-from-zero
    // integer micro-unit rounding of the exact 2-dp-decimal sum / n —
    // recomputed here independently with BigInt, the same formula the
    // DuckDB oracles replay
    val step = 3600L
    val evGen = for {
      key <- Gen.oneOf("a", "b", "c")
      es <- Gen.choose(0L, 12L * step)
      cents <- Gen.choose(-10000L, 10000L)
    } yield (key, es, cents / 100.0)
    check("resample", Prop.forAll(Gen.nonEmptyListOf(evGen)) { rows =>
      val df = rows.toDF("k", "es", "v")
      val out = graft.ops.TimeSeries.resample(df, "k", "es", "v", step)
        .select("k", "slot", "value_avg", "n")
        .as[(String, Long, Option[Double], Long)].collect()
      val byKey = rows.groupBy(_._1)
      byKey.forall { case (k, rs) =>
        val slots = rs.map(r => r._2 - r._2 % step)
        val expectSpine = (slots.min to slots.max by step).toSeq
        val got = out.filter(_._1 == k).sortBy(_._2)
        val obs = rs.groupBy(r => r._2 - r._2 % step)
        got.map(_._2).toSeq == expectSpine &&
          got.map(_._4).sum == rs.size &&
          got.forall { case (_, slot, avg, n) =>
            obs.get(slot) match {
              case None => n == 0L && avg.isEmpty
              case Some(hits) =>
                val cents = hits.map(h => BigInt(math.round(h._3 * 100))).sum
                val micro = (cents.abs * 20000 + hits.size) / (2 * hits.size) * cents.signum
                n == hits.size && avg.contains(micro.toDouble / 1e6)
            }
          }
      }
    })
  }

  test("property: interpolateLinear touches only interior gaps, exactly on the line") {
    // observed values pass through untouched; a null with observed
    // neighbors on both sides lands on the 6-dp-rounded line between
    // them; leading/trailing nulls (no neighbor on one side) stay null
    val cellGen = Gen.option(Gen.choose(-5000L, 5000L).map(_ / 100.0))
    val gridGen = for {
      key <- Gen.oneOf("a", "b")
      cells <- Gen.nonEmptyListOf(cellGen)
    } yield (key, cells)
    check("interpolate", Prop.forAll(Gen.nonEmptyListOf(gridGen)) { grids0 =>
      // one grid per key ("last wins" like a Map, mirroring real input)
      val grids = grids0.toMap
      val rows = grids.toSeq.flatMap { case (k, cells) =>
        cells.zipWithIndex.map { case (v, i) => (k, i.toLong * 3600L, v) }
      }
      val df = rows.toDF("k", "slot", "v")
      val out = graft.ops.TimeSeries.interpolateLinear(df, "k", "slot", "v")
        .as[(String, Long, Option[Double])].collect()
        .map { case (k, slot, v) => (k, slot) -> v }.toMap
      grids.forall { case (k, cells) =>
        val obs = cells.zipWithIndex.collect { case (Some(v), i) => (i, v) }
        cells.zipWithIndex.forall { case (cell, i) =>
          val got = out((k, i.toLong * 3600L))
          cell match {
            case Some(v) => got.contains(v)
            case None =>
              (obs.filter(_._1 < i).lastOption, obs.find(_._1 > i)) match {
                case (Some((pi, pv)), Some((ni, nv))) =>
                  val expect = BigDecimal(pv + (nv - pv) * (i - pi).toDouble / (ni - pi))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  got.contains(expect)
                case _ => got.isEmpty
              }
          }
        }
      }
    })
  }

  test("property: dedupLastWins output is key-unique, keeps max-seq row") {
    val seqRowGen = for {
      id <- Gen.choose(1, 5); v <- Gen.choose(0, 50); seq <- Gen.choose(1, 20)
    } yield (id, v, seq)
    check("dedup-last-wins", Prop.forAll(Gen.nonEmptyListOf(seqRowGen)) { rows0 =>
      // make (id, seq) unique so "last wins" is well-defined
      val rows = rows0.distinctBy(r => (r._1, r._3))
      val df = rows.toDF("id", "v", "seq")
      val out = Upsert.dedupLastWins(df, Seq("id"), "seq").as[(Int, Int, Int)].collect()
      val expect = rows.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
      out.map(_._1).distinct.length == out.length && out.forall(r => r == expect(r._1))
    })
  }
}
