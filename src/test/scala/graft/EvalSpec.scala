package graft

import org.apache.spark.sql.functions.col

import graft.ext.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(Boolean, Double)]): (Long, Long, Option[Double]) = {
    val r = Eval.auc(rows.toDF("y", "s"), "y", "s").collect()(0)
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("perfect separation scores 1, inverted scores 0") {
    assert(aucOf(Seq((true, 1.0), (true, 0.9), (false, 0.1), (false, 0.2)))
      == ((2L, 2L, Some(1.0))))
    assert(aucOf(Seq((true, 0.1), (false, 1.0))) == ((1L, 1L, Some(0.0))))
  }

  test("hand-computed mixed case with ties") {
    // pos scores {.3, .1}, neg scores {.2, .1}:
    // pairs: (.3,.2)win (.3,.1)win (.1,.2)loss (.1,.1)tie=0.5 → 2.5/4 = 0.625
    assert(aucOf(Seq((true, 0.3), (true, 0.1), (false, 0.2), (false, 0.1)))
      == ((2L, 2L, Some(0.625))))
  }

  test("all scores tied gives 0.5; degenerate labels give null") {
    assert(aucOf(Seq((true, 0.5), (false, 0.5), (true, 0.5)))._3 == Some(0.5))
    assert(aucOf(Seq((true, 0.1), (true, 0.2)))._3.isEmpty)
    assert(aucOf(Seq((false, 0.1)))._3.isEmpty)
  }

  test("byte-identical under repartitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ => (rnd.nextBoolean(), (rnd.nextInt(50) / 100.0)))
    val a = Eval.auc(rows.toDF("y", "s"), "y", "s").collect()(0)
    val b = Eval.auc(rows.toDF("y", "s").repartition(7), "y", "s").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("auc/averagePrecision enforce the [0,1] score domain with a pointer") {
    // a raw-logit caller used to get a silent single-partition window
    // blowup (~1e6 groups per unit of score range); now the domain is
    // checked in the scan and raises with the remediation
    val logits = Seq((true, 7.3), (false, -4.2)).toDF("y", "s")
    val e1 = intercept[Exception] {
      Eval.auc(logits, "y", "s").collect()
    }
    assert(e1.getMessage.contains("aucBinned"), e1.getMessage)
    val e2 = intercept[Exception] {
      Eval.averagePrecision(logits, "y", "s").collect()
    }
    assert(e2.getMessage.contains("aucBinned"), e2.getMessage)
    // null scores still pass through (grouped under s = null, as before)
    val withNull = Seq((true, Some(0.9)), (false, Some(0.1)), (true, None))
      .toDF("y", "s")
    assert(Eval.auc(withNull, "y", "s").collect()(0).getLong(0) == 2L)
    // the boundary itself is in-domain
    assert(aucOf(Seq((true, 1.0), (false, 0.0))) == ((1L, 1L, Some(1.0))))
  }

  private def eceOf(rows: Seq[(Boolean, Double)], nBins: Int = 10) = {
    val r = Eval.ece(rows.toDF("y", "s"), "y", "s", nBins).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  test("ece: perfectly calibrated bins score 0") {
    // bin [0.2,0.3): two rows at 0.25, one positive -> conf 0.25 vs
    // acc 0.5... use 4 rows at 0.25 with exactly 1 positive: conf
    // 0.25 == acc 0.25 -> gap 0; same in a second bin
    val rows = Seq((true, 0.25), (false, 0.25), (false, 0.25), (false, 0.25),
      (true, 0.75), (true, 0.75), (true, 0.75), (false, 0.75))
    assert(eceOf(rows) == ((8L, 2L, 0.0, 0.0)))
  }

  test("ece: hand-computed miscalibration across three bins") {
    // bin0: {0.0,T}  conf 0.0  acc 1 -> gap 1.0,  n 1
    // bin1: {0.1,T}  conf 0.1  acc 1 -> gap 0.9,  n 1
    // bin9: {0.9,F},{1.0->clamped,F} conf 0.95 acc 0 -> gap 0.95, n 2
    // ece = (1.0 + 0.9 + 2*0.95)/4 = 0.95; mce = 1.0
    val rows = Seq((true, 0.0), (true, 0.1), (false, 0.9), (false, 1.0))
    assert(eceOf(rows) == ((4L, 3L, 0.95, 1.0)))
  }

  test("ece: out-of-range scores clamp into the edge bins") {
    val rows = Seq((false, -0.5), (true, 1.7))
    val (n, bins, _, _) = eceOf(rows)
    assert(n == 2L && bins == 2L) // one row in bin 0, one in bin 9
  }

  test("ece is byte-identical under repartitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ => (rnd.nextBoolean(), rnd.nextDouble()))
    val a = Eval.ece(rows.toDF("y", "s"), "y", "s").collect()(0)
    val b = Eval.ece(rows.toDF("y", "s").repartition(7), "y", "s").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("confusionAtThresholds: hand-computed counts and ratios") {
    // scores: pos {0.9, 0.6, 0.2}, neg {0.8, 0.3}
    val rows = Seq((true, 0.9), (true, 0.6), (true, 0.2),
      (false, 0.8), (false, 0.3))
    val got = Eval.confusionAtThresholds(rows.toDF("y", "s"), "y", "s",
        Seq(0.5, 0.95)).orderBy("threshold").collect()
    // t=0.5: predicted pos {0.9,0.6,0.8} -> tp 2, fp 1, fn 1, tn 1
    //   precision 2/3, recall 2/3, f1 2*2/(4+1+1) = 2/3
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 1 &&
      got(0).getLong(3) == 1 && got(0).getLong(4) == 1)
    assert(got(0).getDouble(5) == 0.666667 && got(0).getDouble(6) == 0.666667 &&
      got(0).getDouble(7) == 0.666667)
    // t=0.95: nothing predicted positive -> precision null, recall 0
    assert(got(1).getLong(1) == 0 && got(1).getLong(2) == 0)
    assert(got(1).isNullAt(5) && got(1).getDouble(6) == 0.0)
  }

  test("logLoss: hand-computed and clamp keeps wrong-confident finite") {
    // y=1 @ p=0.5 and y=0 @ p=0.5: loss = ln 2 = 0.693147
    val r1 = Eval.logLoss(Seq((true, 0.5), (false, 0.5)).toDF("y", "s"),
      "y", "s").collect()(0)
    assert(r1.getLong(0) == 2L && r1.getDouble(1) == 0.693147)
    // confident and wrong at exactly 0.0/1.0: clamped, finite, huge
    val r2 = Eval.logLoss(Seq((true, 0.0), (false, 1.0)).toDF("y", "s"),
      "y", "s").collect()(0)
    assert(r2.getDouble(1) > 30.0 && !r2.getDouble(1).isInfinite)
  }

  test("randomized: logLoss's distinct-group reduction equals the naive per-row mean") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 400).map(_ => (rnd.nextBoolean(), rnd.nextInt(50) / 50.0))
    val got = Eval.logLoss(rows.toDF("y", "s"), "y", "s").collect()(0).getDouble(1)
    // naive reference: per-row 9-dp-rounded term, exact mean
    val eps = 1e-15
    val terms = rows.map { case (y, s) =>
      val p = math.min(math.max(s, eps), 1.0 - eps)
      val t = if (y) -math.log(p) else -math.log(1.0 - p)
      BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = (terms.sum / terms.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"engine $got vs naive $want")
  }

  test("ndcgAtK: perfect ranking scores 1, inverted scores less") {
    val rel = Seq((1L, 10L, 1.0), (1L, 11L, 1.0), (1L, 12L, 0.0))
      .toDF("query_id", "doc_id", "rel")
    val perfect = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val p = Eval.ndcgAtK(perfect, rel, k = 3).collect()(0)
    assert(p.getDouble(3) == 1.0)
    // relevant docs pushed to ranks 2,3: dcg = 1/log2(3)+1/log2(4)
    //   = 0.630930+0.5 = 1.13093; idcg = 1+1/log2(3) = 1.630930
    val inverted = Seq((1L, 12L, 1), (1L, 10L, 2), (1L, 11L, 3))
      .toDF("query_id", "doc_id", "rank")
    val i = Eval.ndcgAtK(inverted, rel, k = 3).collect()(0)
    assert(i.getDouble(1) == 1.13093 && i.getDouble(2) == 1.63093)
    assert(i.getDouble(3) == 0.693426)
    // unjudged result doc scores 0; all-zero relevance -> null ndcg
    val nr = Seq((2L, 10L, 0.0)).toDF("query_id", "doc_id", "rel")
    val r2 = Eval.ndcgAtK(Seq((2L, 10L, 1)).toDF("query_id", "doc_id", "rank"),
      nr, k = 3).collect()(0)
    assert(r2.getDouble(1) == 0.0 && r2.isNullAt(3))
  }

  test("brier: hand-computed and perfect/worst forecasts") {
    // y=1 @ p=0.8 -> 0.04; y=0 @ p=0.3 -> 0.09; mean 0.065
    val r = Eval.brier(Seq((true, 0.8), (false, 0.3)).toDF("y", "s"),
      "y", "s").collect()(0)
    assert(r.getLong(0) == 2L && r.getDouble(1) == 0.065)
    assert(Eval.brier(Seq((true, 1.0), (false, 0.0)).toDF("y", "s"),
      "y", "s").collect()(0).getDouble(1) == 0.0)
    assert(Eval.brier(Seq((true, 0.0), (false, 1.0)).toDF("y", "s"),
      "y", "s").collect()(0).getDouble(1) == 1.0)
  }

  test("auc: 6-dp rounding contract merges sub-1e-6 score splits") {
    // two scores 1e-9 apart round to the SAME 6-dp group: the pair
    // becomes a half-tie instead of a strict win
    val rows = Seq((true, 0.5000000001), (false, 0.5))
    assert(aucOf(rows) == ((1L, 1L, Some(0.5))))
    // and a >1e-6 split stays a strict win
    assert(aucOf(Seq((true, 0.500002), (false, 0.5))) == ((1L, 1L, Some(1.0))))
  }

  test("aucBinned equals exact auc when scores sit on bin boundaries") {
    // scores k/16 with nBins=16 bin exactly: same groups as Eval.auc's
    // tie case -> 0.625
    val rows = Seq((true, 3.0 / 16), (true, 1.0 / 16),
      (false, 2.0 / 16), (false, 1.0 / 16))
    val r = Eval.aucBinned(rows.toDF("y", "s"), "y", "s", nBins = 16)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.625)))
  }

  test("aucBinned tracks exact auc within ~1/nBins on random scores") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 2000).map { _ =>
      val s = rnd.nextDouble()
      (rnd.nextDouble() < s, s) // label correlates with score: auc ~0.8
    }
    val exact = Eval.auc(rows.toDF("y", "s"), "y", "s").collect()(0).getDouble(2)
    val binned = Eval.aucBinned(rows.toDF("y", "s"), "y", "s", nBins = 1024)
      .collect()(0).getDouble(2)
    assert(math.abs(exact - binned) <= 0.01,
      s"binned $binned drifted from exact $exact")
    assert(exact > 0.7) // sanity: the fixture is actually separable
  }

  test("averagePrecision: hand-computed step PR curve and edge cases") {
    // pos {0.9, 0.2}, neg {0.8}: points P=1@R=.5, P=2/3@R=1 -> 0.833333
    val r = Eval.averagePrecision(
      Seq((true, 0.9), (false, 0.8), (true, 0.2)).toDF("y", "s"), "y", "s")
      .collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.833333)
    // perfect ranking -> 1.0; no positives -> null
    assert(Eval.averagePrecision(
      Seq((true, 1.0), (true, 0.9), (false, 0.1)).toDF("y", "s"), "y", "s")
      .collect()(0).getDouble(2) == 1.0)
    assert(Eval.averagePrecision(
      Seq((false, 1.0), (false, 0.5)).toDF("y", "s"), "y", "s")
      .collect()(0).isNullAt(2))
  }

  test("ece: an un-squashed logit's VALUE clamps, not just its bin") {
    // (false, 7.3) -> bin 9, clamped conf 1.0, acc 0 -> gap exactly 1.0
    // (without the value clamp the bin's mean confidence would be 7.3
    // and the gap a nonsense 7.3)
    val (_, _, eceV, mceV) = eceOf(Seq((false, 7.3)))
    assert(eceV == 1.0 && mceV == 1.0)
  }

  test("mrrAtK: first relevant rank, zero-result and no-hit queries score 0") {
    val results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (3L, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 11L, 1.0), (1L, 12L, 1.0),
      (2L, 20L, 1.0), (3L, 31L, 1.0)).toDF("query_id", "doc_id", "rel")
    val got = Eval.mrrAtK(results, rel, k = 3).orderBy("query_id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 0.5)
    // query 2: judged but returned NO results -> present, rr 0
    assert(got(1).isNullAt(1) && got(1).getDouble(2) == 0.0)
    // query 3: results but none relevant -> rr 0
    assert(got(2).isNullAt(1) && got(2).getDouble(2) == 0.0)
  }

  test("ndcgAtK: a judged query with zero result rows surfaces as dcg 0") {
    val rel = Seq((1L, 10L, 1.0), (9L, 90L, 1.0))
      .toDF("query_id", "doc_id", "rel")
    val results = Seq((1L, 10L, 1)).toDF("query_id", "doc_id", "rank")
    val got = Eval.ndcgAtK(results, rel, k = 3).orderBy("query_id").collect()
    assert(got.length == 2)
    assert(got(1).getLong(0) == 9L && got(1).getDouble(1) == 0.0 &&
      got(1).getDouble(3) == 0.0) // idcg 1.0, ndcg 0 — not absent
  }

  test("reliabilityBins agrees bin-for-bin with the ece fixture") {
    val rows = Seq((true, 0.0), (true, 0.1), (false, 0.9), (false, 1.0))
    val got = Eval.reliabilityBins(rows.toDF("y", "s"), "y", "s")
      .orderBy("bin").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1, 9))
    assert(got(0).getDouble(2) == 0.0 && got(0).getDouble(3) == 1.0 &&
      got(0).getDouble(4) == 1.0)
    assert(got(2).getLong(1) == 2L && got(2).getDouble(2) == 0.95 &&
      got(2).getDouble(4) == 0.95) // 1.0 clamps into bin 9's mass
    // weighted mean of the gaps reproduces ece
    val eceV = Eval.ece(rows.toDF("y", "s"), "y", "s").collect()(0).getDouble(2)
    val wmean = got.map(r => r.getDouble(4) * r.getLong(1)).sum /
      got.map(_.getLong(1)).sum
    assert(math.abs(wmean - eceV) < 1e-6)
  }

  test("spearmanCorr: monotone 1, inverse -1 (with ties), hand 0.8, constant null") {
    def sp(rows: Seq[(Double, Double)]): Option[Double] = {
      val r = Eval.spearmanCorr(rows.toDF("x", "y"), "x", "y").collect()(0)
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    }
    assert(sp(Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0))) == Some(1.0))
    // ties on both sides, perfectly inverse
    assert(sp(Seq((1.0, 30.0), (2.0, 20.0), (2.0, 20.0), (3.0, 10.0)))
      == Some(-1.0))
    // classic: one transposition in 4 -> 1 - 6*2/60 = 0.8
    assert(sp(Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0))) == Some(0.8))
    assert(sp(Seq((5.0, 1.0), (5.0, 2.0))).isEmpty) // constant x
  }

  test("spearmanCorr is byte-identical under repartitioning") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 400).map { _ =>
      val x = rnd.nextInt(30).toDouble
      (x, x * 2 + rnd.nextInt(10)) // monotone-ish with ties
    }
    val a = Eval.spearmanCorr(rows.toDF("x", "y"), "x", "y").collect()(0)
    val b = Eval.spearmanCorr(rows.toDF("x", "y").repartition(7), "x", "y")
      .collect()(0)
    assert(a.toSeq == b.toSeq)
    assert(a.getDouble(1) > 0.9) // sanity: the fixture is monotone-ish
  }

  test("rougeN: clipped counts, identical/appended/short/disjoint regimes") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),          // identical: p=r=f1=1
      (2L, "a b c d", "a b c d e"),        // appended: r=1, p=3/4
      (3L, "a b c d", "x y"),              // disjoint: all 0
      (4L, "a b a b", "a b"),              // clip: ref has {ab:2,ba:1}, hyp {ab:1} -> m=1
      (5L, "a", "a b c")                   // ref too short: n_ref=0, recall null
    ).toDF("id", "ref", "hyp")
    val got = Eval.rougeN(pairs, "id", "ref", "hyp", n = 2)
      .orderBy("id").collect()
    assert(got(0).getDouble(6) == 1.0)
    assert(got(1).getDouble(4) == 0.75 && got(1).getDouble(5) == 1.0 &&
      got(1).getLong(1) == 3L) // 3 matched bigrams of 4 hyp grams
    assert(got(2).getLong(1) == 0L && got(2).getDouble(6) == 0.0)
    // clipped: hyp's single "a b" matches once, not twice
    assert(got(3).getLong(1) == 1L && got(3).getDouble(4) == 1.0 &&
      got(3).getDouble(5) == 0.333333)
    assert(got(4).getLong(2) == 0L && got(4).isNullAt(5) &&
      got(4).getDouble(6) == 0.0)
  }

  test("bleu: hand-computed corpus pooling, brevity penalty, zero-order cutoff") {
    // pair 1 identical (5 toks), pair 2 hyp = front half: pooled
    // m1..m4 = 7,5,3,2 over t1..t4 = 7,5,3,2 -> every p_n = 1, BLEU
    // = BP = exp(1 - 9/7)
    val pairs = Seq(
      (1L, "a b c d e", "a b c d e"),
      (2L, "a b c d", "a b")
    ).toDF("id", "ref", "hyp")
    val r = Eval.bleu(pairs, "id", "ref", "hyp", maxN = 4).collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 7L)
    (2 to 5).foreach(i => assert(r.getDouble(i) == 1.0)) // p1..p4
    val bp = BigDecimal(math.exp(1.0 - 9.0 / 7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == bp && r.getDouble(7) == bp)

    // hyp shorter than 4 tokens everywhere: t4 = 0 -> p4 null, bleu 0
    val short = Seq((1L, "a b c", "a b c")).toDF("id", "ref", "hyp")
    val s = Eval.bleu(short, "id", "ref", "hyp", maxN = 4).collect()(0)
    assert(s.isNullAt(5) && s.getDouble(7) == 0.0 && s.getDouble(6) == 1.0)

    // disjoint pair dilutes pooled precision: p1 = 7/9 with the extra
    // "x y" hyp contributing 2 unmatched unigrams
    val three = pairs.union(Seq((3L, "a b", "x y")).toDF("id", "ref", "hyp"))
    val t3 = Eval.bleu(three, "id", "ref", "hyp", maxN = 1).collect()(0)
    assert(t3.getDouble(2) == 0.777778)
  }

  test("scoreReport: one-pass report agrees with the standalone metrics") {
    import spark.implicits._
    val rows = Seq((true, 0.9), (true, 0.9), (false, 0.1), (false, 0.1),
      (true, 0.5), (false, 0.4)).toDF("y", "p")
    val r = Eval.scoreReport(rows, "y", "p").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == Eval.auc(rows, "y", "p").collect()(0).getDouble(2))
    assert(r.getDouble(4) == Eval.brier(rows, "y", "p").collect()(0).getDouble(1))
    assert(r.getDouble(5) == Eval.logLoss(rows, "y", "p").collect()(0).getDouble(1))
    // threshold 0.5 separates this fixture perfectly (0.5 counts as
    // predicted-positive)
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 1.0 &&
      r.getDouble(8) == 1.0 && r.getDouble(9) == 1.0)

    // all-one-class degenerate: auc null, report still well-formed
    val one = Seq((true, 0.7), (true, 0.6)).toDF("y", "p")
    val o = Eval.scoreReport(one, "y", "p").collect()(0)
    assert(o.isNullAt(3) && o.getDouble(8) == 1.0 && o.isNullAt(7) == false)
  }

  test("bootstrapMeanCI: deterministic, degenerate-constant exact, sane interval") {
    import spark.implicits._
    // constant data: every replicate mean == the value, CI collapses
    val const = (1L to 40L).map((_, 7.5)).toDF("id", "v")
    val c = Eval.bootstrapMeanCI(const, "id", "v", reps = 50).collect()(0)
    assert(c.getLong(0) == 40L && c.getLong(1) == 50L)
    assert(c.getDouble(2) == 7.5 && c.getDouble(3) == 7.5 && c.getDouble(4) == 7.5)

    // varied data: interval brackets sanely and is bit-stable across runs
    val varied = (1L to 100L).map(i => (i, (i % 13).toDouble)).toDF("id", "v")
    val r1 = Eval.bootstrapMeanCI(varied, "id", "v", reps = 100).collect()(0)
    val r2 = Eval.bootstrapMeanCI(varied, "id", "v", reps = 100).collect()(0)
    assert(r1 == r2)
    assert(r1.getDouble(3) <= r1.getDouble(2) && r1.getDouble(2) <= r1.getDouble(4))
    assert(r1.getDouble(4) - r1.getDouble(3) > 0) // non-degenerate spread
  }

  test("logLossByGroup: flags the uninformative group the mean hides") {
    import spark.implicits._
    val rows = Seq(
      ("g1", true, 0.9), ("g1", true, 0.9), ("g1", false, 0.1), ("g1", false, 0.1),
      ("g2", true, 0.5), ("g2", true, 0.5)
    ).toDF("g", "y", "p")
    val got = Eval.logLossByGroup(rows, "g", "y", "p").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("g2", "g1")) // worst first
    assert(got(0).getDouble(2) == 0.693147 && got(0).getBoolean(3))
    assert(got(1).getDouble(2) == 0.105361 && !got(1).getBoolean(3))
  }

  test("krippendorffAlpha: perfect, zero, systematic disagreement, missing data") {
    import spark.implicits._
    // perfect within-unit agreement incl. a 3-rating and a 2-rating
    // unit: Do = 0 -> alpha 1 (margins differ, so De > 0)
    val perfect = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("u", "label")
    val p = Eval.krippendorffAlpha(perfect, "u", "label").collect()(0)
    assert(p.getLong(0) == 2L && p.getLong(1) == 5L && p.getLong(2) == 2L &&
      p.getDouble(3) == 1.0)

    // unit1 (a,a), unit2 (a,b): Num=2, n=4, margins 3/1 -> De sum 6
    // alpha = 1 - 3*2/6 = 0
    val half = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")).toDF("u", "label")
    assert(Eval.krippendorffAlpha(half, "u", "label").collect()(0)
      .getDouble(3) == 0.0)

    // both units (a,b): systematic disagreement, alpha = 1 - 3*4/8 = -0.5
    val dis = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("u", "label")
    assert(Eval.krippendorffAlpha(dis, "u", "label").collect()(0)
      .getDouble(3) == -0.5)

    // nulls drop; a 1-rating unit contributes nothing (u3 vanishes)
    val miss = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, null.asInstanceOf[String])).toDF("u", "label")
    val ms = Eval.krippendorffAlpha(miss, "u", "label").collect()(0)
    assert(ms.getLong(0) == 2L && ms.getLong(1) == 4L && ms.getDouble(3) == 1.0)

    // single label everywhere: De = 0, alpha null
    val const = Seq((1L, "a"), (1L, "a")).toDF("u", "label")
    assert(Eval.krippendorffAlpha(const, "u", "label").collect()(0).isNullAt(3))
  }

  test("localAlign: substitution-tolerant spans, gaps, substrings, degenerate") {
    val pairs = Seq(
      (1L, "a b c", "a b c"),          // identical: 3 matches = 6, norm 1
      (2L, "a b c d e", "a x c d e"),  // one substitution: 2-1+2+2+2 = 7
      (3L, "a b c d", "c d"),          // substring: 4, norm 4/(2*2) = 1
      (4L, "a b c d e", "a b d e"),    // one-token gap: 2+2-1+2+2 = 7
      (5L, "a b", "x y"),              // disjoint: 0
      (6L, "a b", "")                  // empty side: 0, norm null
    ).toDF("id", "ref", "hyp")
    val got = Eval.localAlign(pairs, "id", "ref", "hyp").orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(6L, 7L, 4L, 7L, 0L, 0L))
    assert(got(0).getDouble(4) == 1.0)
    assert(got(1).getDouble(4) == 0.7)
    assert(got(2).getDouble(4) == 1.0)
    assert(got(3).getDouble(4) == 0.875)
    assert(got(4).getDouble(4) == 0.0)
    assert(got(5).isNullAt(4))
  }

  test("rougeL: textbook LCS, order-sensitivity vs rougeN, degenerate sides") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),      // identical: lcs 4, f1 1
      (2L, "a b c b d a b", "b d c a b a"), // CLRS example: lcs 4
      (3L, "a b c d", "a c d"),        // gapped subsequence: lcs 3 (bigram ROUGE would see only "c d")
      (4L, "a b c d", "d c b a"),      // reversal: lcs 1 (any single token)
      (5L, "a b", ""),                 // empty hyp: lcs 0, precision null
      (6L, "", "x y")                  // empty ref: recall null
    ).toDF("id", "ref", "hyp")
    val got = Eval.rougeL(pairs, "id", "ref", "hyp").orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 4L, 3L, 1L, 0L, 0L))
    assert(got(0).getDouble(6) == 1.0)
    assert(got(2).getDouble(4) == 1.0 && // precision 3/3
      got(2).getDouble(5) == 0.75 &&     // recall 3/4
      got(2).getDouble(6) == BigDecimal(6.0 / 7)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(4).isNullAt(4) && got(4).getDouble(5) == 0.0)
    assert(got(5).isNullAt(5) && got(5).getDouble(4) == 0.0)
  }

  test("chrF: identical pair is 1.0, recall-weighting beats precision at beta=2") {
    // identical: every order P = R = 1 -> chrF 1
    val same = Seq((1L, "ab cd", "ab cd")).toDF("id", "ref", "hyp")
    val r0 = Eval.chrF(same, "id", "ref", "hyp", maxN = 2).collect()(0)
    assert(r0.getLong(0) == 4L && r0.getDouble(2) == 1.0 &&
      r0.getDouble(3) == 1.0 && r0.getDouble(4) == 1.0)

    // ref "abcd", hyp "ab": chars 4 vs 2. n=1: m=2, tr=4, th=2;
    // n=2: m=1, tr=3, th=1 -> P=(1+1)/2=1, R=(1/2+1/3)/2=5/12
    // chrF2 = 5*P*R/(4P+R) = 5*(5/12)/(4+5/12) = (25/12)/(53/12) = 25/53
    val pr = Seq((1L, "a b c d", "a b")).toDF("id", "ref", "hyp")
    val r1 = Eval.chrF(pr, "id", "ref", "hyp", maxN = 2).collect()(0)
    assert(r1.getDouble(2) == 1.0)
    assert(r1.getDouble(3) == BigDecimal(5.0 / 12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r1.getDouble(4) == BigDecimal(25.0 / 53)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

    // disjoint: chrF exactly 0, not null
    val dis = Seq((1L, "aa", "zz")).toDF("id", "ref", "hyp")
    assert(Eval.chrF(dis, "id", "ref", "hyp", maxN = 2).collect()(0)
      .getDouble(4) == 0.0)
  }

  test("cohenKappa: textbook 2x2 case, perfect, and degenerate-constant") {
    // cells (y,y)=20 (y,n)=5 (n,y)=10 (n,n)=15: po .7, pe .5, kappa .4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(0) == 50L && r.getDouble(1) == 0.7 &&
      r.getDouble(2) == 0.5 && r.getDouble(3) == 0.4)
    // identical raters over >1 label: kappa 1
    val p = Eval.cohenKappa(Seq(("x", "x"), ("y", "y"), ("z", "z"))
      .toDF("a", "b"), "a", "b").collect()(0)
    assert(p.getDouble(3) == 1.0)
    // both raters constant: pe = 1, kappa undefined -> null
    val d = Eval.cohenKappa(Seq(("x", "x"), ("x", "x")).toDF("a", "b"),
      "a", "b").collect()(0)
    assert(d.isNullAt(3))
  }

  test("chi2Independence: hand-computed tables incl. observed-zero cells") {
    // (10,20 / 20,10): e=15 everywhere, chi2 = 4*(25/15) = 6.666667, dof 1
    val rows = Seq.fill(10)(("a", "u")) ++ Seq.fill(20)(("a", "v")) ++
      Seq.fill(20)(("b", "u")) ++ Seq.fill(10)(("b", "v"))
    val r = Eval.chi2Independence(rows.toDF("x", "y"), "x", "y").collect()(0)
    assert(r.getLong(0) == 60L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 6.666667)
    // perfect separation WITH observed-zero cells: those cells still
    // contribute their expected mass -> chi2 = n
    val sep = Seq.fill(5)(("a", "u")) ++ Seq.fill(5)(("b", "v"))
    val s2 = Eval.chi2Independence(sep.toDF("x", "y"), "x", "y").collect()(0)
    assert(s2.getDouble(2) == 10.0)
    // exact independence: chi2 0
    val ind = for (x <- Seq("a", "b"); y <- Seq("u", "v")) yield (x, y)
    assert(Eval.chi2Independence(ind.toDF("x", "y"), "x", "y")
      .collect()(0).getDouble(2) == 0.0)
  }

  test("cohenKappa and chi2 are byte-identical under repartitioning") {
    val rnd = new scala.util.Random(17)
    val labs = Seq("a", "b", "c", "d")
    val rows = (1 to 600).map(_ =>
      (labs(rnd.nextInt(4)), labs(rnd.nextInt(4))))
    val k1 = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
    val k2 = Eval.cohenKappa(rows.toDF("a", "b").repartition(7), "a", "b")
      .collect()(0)
    assert(k1.toSeq == k2.toSeq)
    val c1 = Eval.chi2Independence(rows.toDF("x", "y"), "x", "y").collect()(0)
    val c2 = Eval.chi2Independence(rows.toDF("x", "y").repartition(9), "x", "y")
      .collect()(0)
    assert(c1.toSeq == c2.toSeq)
  }

  test("logLoss is byte-identical under repartitioning") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map(_ => (rnd.nextBoolean(), rnd.nextInt(100) / 100.0))
    val a = Eval.logLoss(rows.toDF("y", "s"), "y", "s").collect()(0)
    val b = Eval.logLoss(rows.toDF("y", "s").repartition(9), "y", "s").collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("pinballLoss: hand-computed check function, both branches") {
    // (y, yhat): (10, 8) -> d=2 (under-forecast), (4, 9) -> d=-5 (over)
    val df = Seq((10, 8), (4, 9)).toDF("y", "yh")
    val out = Eval.pinballLoss(df, "y", "yh", Seq(0.1, 0.9)).collect()
    // q=0.1: 0.1*2 + 0.9*5 = 4.7 -> mean 2.35; q=0.9: 0.9*2+0.1*5=2.3
    assert(out.map(_.getDouble(0)).toSeq === Seq(0.1, 0.9))
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L))
    assert(out(0).getDouble(3) === 2.35)
    assert(out(1).getDouble(3) === 1.15)
  }

  test("pinballLoss: perfect forecast scores zero, q bounds enforced") {
    val df = Seq((5, 5), (7, 7)).toDF("y", "yh")
    val z = Eval.pinballLoss(df, "y", "yh", Seq(0.5)).collect()(0)
    assert(z.getDouble(3) === 0.0)
    intercept[IllegalArgumentException] {
      Eval.pinballLoss(df, "y", "yh", Seq(1.0))
    }
  }

  test("mutualInformation: identical columns give MI = H, NMI = 1") {
    val df = Seq("a", "a", "b", "b", "c", "c", "c", "c")
      .map(v => (v, v)).toDF("x", "y")
    val r = Eval.mutualInformation(df, "x", "y").collect()(0)
    assert(r.getLong(0) == 8L && r.getLong(1) == 3L)
    // H = -(2/8 ln 2/8)*2 - 4/8 ln 4/8 = 1.039721 at the 6-dp contract
    assert(r.getDouble(2) === r.getDouble(4)) // hx == mi when y == x
    assert(r.getDouble(5) === 1.0)            // nmi exactly 1
  }

  test("mutualInformation: independent columns score ~0") {
    // balanced product distribution: every (x, y) cell equally likely
    val rows = for { x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 5 }
      yield (x, y)
    val r = Eval.mutualInformation(rows.toDF("x", "y"), "x", "y").collect()(0)
    assert(math.abs(r.getDouble(4)) < 1e-9 && math.abs(r.getDouble(5)) < 1e-9)
  }

  test("mutualInformation is byte-identical under repartitioning") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 400).map(_ => (s"x${rnd.nextInt(6)}", s"y${rnd.nextInt(5)}"))
    val a = Eval.mutualInformation(rows.toDF("x", "y"), "x", "y").collect()(0)
    val b = Eval.mutualInformation(rows.toDF("x", "y").repartition(7), "x", "y")
      .collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("ksTestBinned: disjoint supports give D = 1, identical give 0") {
    val df = (1 to 50).map(i => (i / 100.0, "a")) ++
      (1 to 50).map(i => (0.5 + i / 100.0, "b"))
    val r = Eval.ksTestBinned(df.toDF("v", "g"), "v", "g", "a", "b",
      lo = 0.0, hi = 1.0, nBins = 100).collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 50L)
    assert(r.getDouble(3) === 1.0)
    val same = (1 to 50).flatMap(i => Seq((i / 50.0, "a"), (i / 50.0, "b")))
    val r2 = Eval.ksTestBinned(same.toDF("v", "g"), "v", "g", "a", "b",
      lo = 0.0, hi = 1.0, nBins = 100).collect()(0)
    assert(r2.getDouble(3) === 0.0 && r2.getDouble(4) === 0.0)
  }

  test("ksTestBinned: hand-computed half-shifted masses") {
    // a: 3 rows in bin 0; b: 1 row bin 0, 3 rows bin 1
    // CDFs: after bin0 a=3/3, b=1/4 -> D = |3*4 - 1*3| / 12 = 9/12
    val df = Seq((0.1, "a"), (0.2, "a"), (0.3, "a"),
      (0.4, "b"), (0.6, "b"), (0.7, "b"), (0.8, "b"))
    val r = Eval.ksTestBinned(df.toDF("v", "g"), "v", "g", "a", "b",
      lo = 0.0, hi = 1.0, nBins = 2).collect()(0)
    assert(r.getDouble(3) === 0.75)
    // ks_stat = sqrt(3*4/7) * 0.75 rounded to 6 dp
    assert(r.getDouble(4) === BigDecimal(math.sqrt(12.0 / 7.0) * 0.75)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("clusteringEval: perfect clustering scores 1 everywhere") {
    val df = Seq((1, "p1", "t1"), (2, "p1", "t1"), (3, "p2", "t2"),
      (4, "p2", "t2"), (5, "p3", "t3")).toDF("id", "p", "t")
    val r = Eval.clusteringEval(df, "id", "p", "t").collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 1.0)
    assert(r.getDouble(5) === 1.0 && r.getDouble(6) === 1.0)
  }

  test("clusteringEval: hand-computed split cluster") {
    // truth: {1,2,3,4} one class; pred splits it {1,2},{3,4}
    // pairs agreeing = 2, predicted pairs = 2, truth pairs = 6
    val df = Seq((1, "a", "t"), (2, "a", "t"), (3, "b", "t"), (4, "b", "t"))
      .toDF("id", "p", "t")
    val r = Eval.clusteringEval(df, "id", "p", "t").collect()(0)
    assert(r.getDouble(3) === 1.0)        // precision 2/2
    assert(r.getDouble(4) === 0.333333)   // recall 2/6
    assert(r.getDouble(5) === 0.5)        // f1 = 2*2/(2+6)
    // ARI: expected index e = 2*6/6 = 2 equals the 2 agreeing pairs,
    // so splitting one truth class scores exactly chance level
    assert(r.getDouble(6) === 0.0)
  }

  test("clusteringEval: singletons-vs-singletons ari is null (degenerate)") {
    val df = Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "p", "t")
    val r = Eval.clusteringEval(df, "id", "p", "t").collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("conformal: hand-computed rank threshold and coverage") {
    // calibration scores 1..10, alpha=0.2: rank = ceil(11*0.8) = 9,
    // qhat = 9.0; eval scores 2.5 and 9.5 -> coverage 1/2
    val rows = (1 to 10).map(i => (i.toDouble, true)) ++
      Seq((2.5, false), (9.5, false))
    val r = Eval.conformal(rows.toDF("s", "cal"), "s", "cal", Seq(0.2))
      .collect()(0)
    assert(r.getDouble(0) === 0.2)
    assert(r.getLong(1) === 10L)      // n_calib
    assert(r.getLong(2) === 9L)       // rk
    assert(r.getDouble(3) === 9.0)    // qhat
    assert(r.getLong(4) === 2L)       // n_eval
    assert(r.getDouble(5) === 0.5)    // coverage
  }

  test("conformal: tied scores resolve by cumulative count, not rows") {
    // calibration 1,1,1,5: alpha=0.5 -> rank = ceil(5*0.5) = 3 ->
    // the 3rd smallest is still 1 (the distinct-value frame must
    // credit the full tie count)
    val rows = Seq((1.0, true), (1.0, true), (1.0, true), (5.0, true),
      (0.5, false))
    val r = Eval.conformal(rows.toDF("s", "cal"), "s", "cal", Seq(0.5))
      .collect()(0)
    assert(r.getLong(2) === 3L && r.getDouble(3) === 1.0)
    assert(r.getDouble(5) === 1.0) // eval 0.5 <= 1 covered
  }

  test("conformal: alpha too small for n yields null qhat, not a row drop") {
    // n=3: rank = ceil(4*0.99) = 4 > 3 -> no certifiable threshold
    val rows = Seq((1.0, true), (2.0, true), (3.0, true), (1.5, false))
    val out = Eval.conformal(rows.toDF("s", "cal"), "s", "cal",
      Seq(0.01, 0.5)).orderBy("alpha").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 4L && out(0).isNullAt(3) && out(0).isNullAt(5))
    assert(out(1).getDouble(3) === 2.0) // rank ceil(4*.5)=2 -> 2.0
  }

  test("conformal: empty calibration still returns one row per alpha") {
    val rows = Seq((1.0, false), (2.0, false))
    val out = Eval.conformal(rows.toDF("s", "cal"), "s", "cal", Seq(0.1))
      .collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 0L && out(0).isNullAt(3))
  }

  test("conformalFromCounts: count form equals the row form (merge safety)") {
    // the streaming closure consumes pre-merged (s, c) counts: the
    // result must be byte-identical to conformal over the expanded rows
    val rows = Seq((1.0, true), (1.0, true), (1.0, true), (5.0, true),
      (0.5, false), (2.0, false))
    val fromRows = Eval.conformal(rows.toDF("s", "cal"), "s", "cal",
      Seq(0.3, 0.5)).collect().map(_.toSeq)
    import org.apache.spark.sql.functions.{round => rnd}
    def counts(cal: Boolean) = rows.filter(_._2 == cal)
      .groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .toDF("s0", "c")
      .select(rnd(col("s0"), 6).cast("decimal(18,6)").as("s"), col("c"))
    val fromCounts = Eval.conformalFromCounts(counts(true), counts(false),
      Seq(0.3, 0.5)).collect().map(_.toSeq)
    assert(fromRows.toSeq === fromCounts.toSeq)
  }

  test("conformal: rejects bad alphas") {
    val df = Seq((1.0, true)).toDF("s", "cal")
    intercept[IllegalArgumentException](
      Eval.conformal(df, "s", "cal", Seq.empty))
    intercept[IllegalArgumentException](
      Eval.conformal(df, "s", "cal", Seq(1.5)))
    intercept[IllegalArgumentException](
      Eval.conformal(df, "s", "cal", Seq(0.1, 0.1)))
  }

  test("bhFdr: hand-computed rejection set at q = 1/4") {
    // thresholds i*q/m = 0.0625*i: 0.01<=0.0625 yes, 0.02<=0.125 yes,
    // 0.2<=0.1875 no, 0.9<=0.25 no -> kmax=2
    val df = Seq(("m1", 0.01), ("m2", 0.02), ("m3", 0.2), ("m4", 0.9))
      .toDF("id", "p")
    val out = Eval.bhFdr(df, "id", "p", 1L, 4L).collect()
    assert(out.map(r => (r.getString(0), r.getBoolean(4))).toSeq ===
      Seq(("m1", true), ("m2", true), ("m3", false), ("m4", false)))
  }

  test("bhFdr: the closure sweeps up interior non-qualifying ranks") {
    // rank 2 (0.13 > 0.125) fails its OWN test but rank 3 qualifies
    // (0.14 <= 0.1875), so BH rejects ranks 1..3 including rank 2
    val df = Seq(("a", 0.01), ("b", 0.13), ("c", 0.14), ("d", 0.9))
      .toDF("id", "p")
    val out = Eval.bhFdr(df, "id", "p", 1L, 4L).collect()
    assert(out.map(_.getBoolean(3)).toSeq ===
      Seq(true, false, true, false))      // raw per-rank tests
    assert(out.map(_.getBoolean(4)).toSeq ===
      Seq(true, true, true, false))       // closure
  }

  test("bhFdr: nothing qualifies -> nothing significant; bad q rejected") {
    val df = Seq(("a", 0.5), ("b", 0.9)).toDF("id", "p")
    val out = Eval.bhFdr(df, "id", "p", 1L, 20L).collect()
    assert(out.forall(!_.getBoolean(4)))
    intercept[IllegalArgumentException](Eval.bhFdr(df, "id", "p", 5L, 4L))
  }

  test("chi2GoF: hand-computed SRM stat and flag") {
    // 30/10 against 1:1 -> E = 20 each, terms 5 + 5, stat 10 > 3.841
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("arm")
    val out = Eval.chi2GoF(df, "arm",
      Seq("a" -> ((1L, 2L)), "b" -> ((1L, 2L))), critValue = 3.841)
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))).toSeq ===
      Seq(("a", 30L, 20.0, 5.0), ("b", 10L, 20.0, 5.0)))
    assert(out.forall(r => r.getDouble(4) === 10.0 && r.getLong(5) === 1L
      && r.getBoolean(6)))
  }

  test("chi2GoF: an expected group with zero observations contributes E") {
    val df = Seq("a", "a").toDF("arm")
    val out = Eval.chi2GoF(df, "arm",
      Seq("a" -> ((1L, 2L)), "b" -> ((1L, 2L))), critValue = 3.841)
      .collect()
    // N=2, E=1 each: terms (2-1)^2/1 = 1 and (0-1)^2/1 = 1 -> stat 2
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 2L), ("b", 0L)))
    assert(out.forall(r => r.getDouble(4) === 2.0 && !r.getBoolean(6)))
  }

  test("chi2GoF: an observed group missing from expected raises loudly") {
    val df = Seq("a", "b", "zz").toDF("arm")
    val e = intercept[Exception](
      Eval.chi2GoF(df, "arm",
        Seq("a" -> ((1L, 2L)), "b" -> ((1L, 2L))), 3.841).collect())
    assert(e.getMessage.contains("no expected share"))
  }

  test("labelNoise: hand-computed confident joint with one flipped label") {
    // a-threshold = mean pa over given-a = (0.9+0.7+0.1)/3 = 0.566667
    // (the mislabeled row 5 drags it down); b-threshold =
    // (0.8+0.6)/2 = 0.7. Row 4 (pa=0.4, pb=0.6) clears neither ->
    // abstains; row 5 (given a, pb=0.9 >= 0.7) is confident-b ->
    // the off-diagonal (a, b) cell
    val df = Seq(
      ("a", 0.9, 0.1), ("a", 0.7, 0.3), // true a
      ("b", 0.2, 0.8), ("b", 0.4, 0.6), // true b
      ("a", 0.1, 0.9)                   // mislabeled: model says b
    ).toDF("y", "pa", "pb")
    val out = Eval.labelNoise(df, "y",
      Seq("a" -> col("pa"), "b" -> col("pb"))).collect()
    val cells = out.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // a-threshold 0.566667: rows with pa >= it: 0.9, 0.7 qualify-a
    // b-threshold 0.7: pb >= 0.7: 0.8 (row3), 0.9 (row5) qualify-b
    assert(cells === Map(("a", "a") -> 2L, ("b", "b") -> 1L, ("a", "b") -> 1L))
    val head = out.head
    assert(head.getLong(4) === 5L)           // n_rows
    assert(head.getLong(5) === 4L)           // n_confident
    assert(head.getDouble(6) === 0.25)       // noise_frac 1/4
  }

  test("labelNoise: a class with no given rows never qualifies") {
    val df = Seq(("a", 0.5, 0.5), ("a", 0.6, 0.4)).toDF("y", "pa", "pb")
    val out = Eval.labelNoise(df, "y",
      Seq("a" -> col("pa"), "b" -> col("pb"))).collect()
    // b has no threshold (null sum) -> only diagonal a-cells possible
    assert(out.forall(r => r.getString(1) === "a"))
  }

  test("labelNoise: argmax ties break to the earliest declared class") {
    // both classes qualify at equal probability -> 'a' declared first
    val df = Seq(("a", 0.5, 0.5), ("b", 0.5, 0.5)).toDF("y", "pa", "pb")
    val out = Eval.labelNoise(df, "y",
      Seq("a" -> col("pa"), "b" -> col("pb"))).collect()
    assert(out.forall(r => r.getString(1) === "a"))
  }
}
