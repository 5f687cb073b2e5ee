package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}
import graft.functions.VectorExpressions
import graft.plans.{SdcTopKPlan, TopKHeap}

/** The fused probe-join + partial-top-k physical operator
  * (plans/SdcTopKPlan.scala) must be INVISIBLE to results: the global
  * shortlist it feeds is byte-identical to the compositional
  * broadcast-join + window plan it replaced, under clustered and
  * arbitrary partitioning, with ties and self-exclusion exercised.
  */
class SdcTopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16; private val m = 4; private val ksub = 8

  /** 8 tight clusters of 25 — near-dup ties are common, so the
    * (score DESC, id ASC) tie-break is genuinely exercised. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(19)
    val anchors = Array.fill(8, dim)(rnd.nextFloat() * 10f - 5f)
    val rows = (0 until 200).map { i =>
      val a = anchors(i % 8)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.3f - 0.15f).toSeq)
    }
    rows.toDF("id", "v").withColumn("v", Pq.normalized(col("v").cast("array<float>")))
  }

  private def fixture() = {
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val cb = Pq.trainCodebooks(corpus, "v", "id", dim, m, ksub, iterations = 1)
    val (cbFlat, cbHalves) = Pq.flatCbArrays(cb, dim, m, ksub)
    val tbl = Pq.sdcTableFromFlat(cbFlat, dim, m, ksub)
    val encC = assigned
      .withColumn("codes",
        Pq.codesOnFlat(cbFlat, cbHalves, Pq.normalized(col("cv")), dim, m, ksub))
      .withColumn("cnorm",
        sqrt(VectorExpressions.pqSdcScore(col("codes"), col("codes"), tbl, m, ksub)))
      .select(col("corpus_id"), col("cell"), col("codes"), col("cnorm"))
    val (units, cellIds, cdim) = Similarity.flatCentroids(cents, normalize = true)
    val qp = corpus.select(col("id").as("query_id"),
        Pq.codesOnFlat(cbFlat, cbHalves, Pq.normalized(col("v")), dim, m, ksub)
          .as("qcodes"),
        explode(VectorExpressions.nearestCellsTopK(
          col("v"), units, cellIds, cdim, 2)).as("pc"))
      .select(col("query_id"), col("qcodes"), col("pc.cell").as("cell"))
    (encC, qp, tbl)
  }

  private def shortlistVia(partial: org.apache.spark.sql.DataFrame,
                           c: Int): Seq[(Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("corpus_id").asc)
    partial.withColumn("pr", row_number().over(w))
      .filter(col("pr") <= c)
      .select("query_id", "corpus_id").as[(Long, Long)]
      .collect().sorted.toSeq
  }

  test("fused partial top-k == compositional join+window, all partitionings") {
    val (encC, qp, tbl) = fixture()
    val c = 7
    val compositional = encC.join(broadcast(qp), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        when(col("cnorm") > 0,
          VectorExpressions.pqSdcScore(col("qcodes"), col("codes"), tbl, m, ksub)
            / col("cnorm"))
          .otherwise(lit(Double.NegativeInfinity)).as("ascore"))
    val want = shortlistVia(compositional, c)
    assert(want.nonEmpty)
    val tblB = VectorExpressions.sdcTableBroadcast(tbl)
    // clustered by cell (the production layout), arbitrary hash
    // partitioning, and a single partition — the partial-per-partition
    // superset property must make all three collapse to the same
    // global shortlist
    for (arrange <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        identity, _.repartition(col("cell")), _.repartition(7), _.coalesce(1))) {
      val fused = SdcTopKPlan.partialTopK(arrange(encC), qp, tblB, m, ksub, c)
      assert(shortlistVia(fused, c) === want)
    }
  }

  test("fused operator plans as ProbeTopK and emits bounded partials") {
    val (encC, qp, tbl) = fixture()
    val tblB = VectorExpressions.sdcTableBroadcast(tbl)
    val fused = SdcTopKPlan.partialTopK(encC.repartition(col("cell")), qp,
      tblB, m, ksub, 5)
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("ProbeTopK"), s"fused node missing:\n$plan")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "the probe join must be fused away")
    // per (partition, query) at most preRankC rows — with cell
    // clustering every query's candidates land in one partition, so
    // the PARTIAL output is already globally bounded
    val perQuery = fused.groupBy("query_id").count()
      .agg(max("count")).as[Long].first()
    assert(perQuery <= 5 * 32, s"unbounded partial: $perQuery")
  }

  test("end-to-end prerank path uses the fused operator and keeps recall") {
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val cb = Pq.trainCodebooks(corpus, "v", "id", dim, m, ksub, iterations = 1)
    val q = corpus.filter(col("id") < 20)
    val pre = Pq.ivfSdcPrerankTopK(assigned, cents, cb, q, "v", "id",
      k = 10, nProbe = 2, preRankC = 30, dim = dim, m = m, ksub = ksub)
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("ProbeTopK"),
      s"prerank path did not route through the fused operator:\n$plan")
    val exact = Similarity.ivfTopK(assigned, cents, q, "v", "id",
      k = 10, nProbe = 2)
    val recall = Similarity.recallAtK(pre, exact)
      .agg(avg("recall")).as[Double].first()
    assert(recall >= 0.9, s"fused prerank recall $recall")
  }

  test("cosine mode: fused ivfTopK == compositional join+window, byte-identical") {
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val q = corpus.filter(col("id") < 30)
    // the shipped path (fused when the layout is long-id/float-vec)
    val fused = Similarity.ivfTopK(assigned, cents, q, "v", "id",
      k = 7, nProbe = 2)
    assert(fused.queryExecution.executedPlan.toString.contains("ProbeTopK"),
      "ivfTopK did not route through the fused operator")
    // the compositional reference, built by hand (exact cosineF + rank)
    val (units, cellIds, cdim) = Similarity.flatCentroids(cents, normalize = true)
    val probes = q.select(col("id").as("query_id"), col("v").as("qv"),
        explode(VectorExpressions.nearestCellsTopK(
          col("v"), units, cellIds, cdim, 2)).as("pc"))
      .select(col("query_id"), col("qv"), col("pc.cell").as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    val reference = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", VectorExpressions.cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("query_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
    assert(fused.orderBy("query_id", "rank").collect() ===
      reference.orderBy("query_id", "rank").collect())
    // arbitrary corpus partitioning must not change the result
    val fused7 = Similarity.ivfTopK(assigned.repartition(7), cents, q,
      "v", "id", k = 7, nProbe = 2)
    assert(fused7.orderBy("query_id", "rank").collect() ===
      reference.orderBy("query_id", "rank").collect())
  }

  test("partitioned-probe mode == broadcast mode, byte-identical (sdc)") {
    val (encC, qp, tbl) = fixture()
    val tblB = VectorExpressions.sdcTableBroadcast(tbl)
    val c = 7
    // broadcast mode (default threshold) is the pinned reference
    val bcast = SdcTopKPlan.partialTopK(encC, qp, tblB, m, ksub, c)
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      "default threshold must keep the probe side broadcast on tiny data")
    val want = shortlistVia(bcast, c)
    spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "-1")
    try {
      // threshold -1 disables broadcast entirely — the BHJ→SMJ pattern
      val part = SdcTopKPlan.partialTopK(encC, qp, tblB, m, ksub, c)
      val plan = part.queryExecution.executedPlan.toString
      assert(plan.contains("ProbeTopK"), s"fused node missing:\n$plan")
      assert(!plan.contains("BroadcastExchange"),
        s"partitioned mode must not broadcast the probe side:\n$plan")
      assert(plan.contains("hashpartitioning"),
        s"partitioned mode must cell-cluster both sides:\n$plan")
      assert(shortlistVia(part, c) === want)
      // and under hostile pre-partitionings of either side
      assert(shortlistVia(SdcTopKPlan.partialTopK(
        encC.repartition(7), qp.coalesce(1), tblB, m, ksub, c), c) === want)
    } finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
  }

  test("partitioned-probe mode == broadcast mode, byte-identical (cosine ivfTopK)") {
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val q = corpus.filter(col("id") < 30)
    val reference = Similarity.ivfTopK(assigned, cents, q, "v", "id",
      k = 7, nProbe = 2).orderBy("query_id", "rank").collect()
    spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "-1")
    try {
      val part = Similarity.ivfTopK(assigned, cents, q, "v", "id",
        k = 7, nProbe = 2)
      val plan = part.queryExecution.executedPlan.toString
      assert(plan.contains("ProbeTopK") && !plan.contains("BroadcastExchange"),
        s"expected partitioned fused plan:\n$plan")
      assert(part.orderBy("query_id", "rank").collect() === reference)
    } finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
  }

  test("probe-side size threshold picks the mode (BHJ→SMJ escalation)") {
    val (encC, qp, tbl) = fixture()
    val tblB = VectorExpressions.sdcTableBroadcast(tbl)
    // a 1-byte threshold: any real probe side exceeds it → partitioned
    spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "1")
    try {
      val plan = SdcTopKPlan.partialTopK(encC, qp, tblB, m, ksub, 5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"probe side above threshold must escalate to partitioned:\n$plan")
    } finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
  }

  test("fused pair-threshold scan == compositional self-join, byte-identical") {
    def run(useFused: Boolean, arrange: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      graft.ext.Dedup.embeddingNearDupsBucketed(
        arrange(corpus), "v", "id", threshold = 0.99, nCells = 8, nProbe = 2,
        useFused = Some(useFused))
        .orderBy("id_a", "id_b").collect()
    val want = run(useFused = false, identity)
    assert(want.nonEmpty, "fixture must produce near-dup pairs")
    val fused = run(useFused = true, identity)
    assert(fused === want)
    // plan shape: fused, partitioned (self-join => never broadcast),
    // no self-join row materialization
    val plan = graft.ext.Dedup.embeddingNearDupsBucketed(
      corpus, "v", "id", 0.99, nCells = 8, nProbe = 2, useFused = Some(true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ProbeTopK"), s"pair scan not fused:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"self-join pair scan must not broadcast a corpus-sized side:\n$plan")
    // hostile input partitionings collapse to the same pairs
    assert(run(useFused = true, _.repartition(7)) === want)
    assert(run(useFused = true, _.coalesce(1)) === want)
  }

  test("zero-norm vectors raise loudly in BOTH pair paths (ANSI Divide parity)") {
    // a zero vector makes the cosine denominator 0: the compositional
    // plan's Divide raises DIVIDE_BY_ZERO under ANSI (the Spark 4
    // default), and the fused scorer must be equally loud — a silent
    // NaN/∞ pair at 100 TB is unfindable corruption
    val base = (0 until 40).map(i => (i.toLong, Seq.fill(dim)(0.5f + i * 0.001f)))
    val zeros = Seq((100L, Seq.fill(dim)(0f)), (101L, Seq.fill(dim)(0f)))
    val embs = (base ++ zeros).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    def pairs(useFused: Boolean) = graft.ext.Dedup.embeddingNearDupsBucketed(
      embs, "v", "id", threshold = 0.9999, nCells = 2, nProbe = 2,
      useFused = Some(useFused))
      .orderBy("id_a", "id_b").collect()
    val eComp = intercept[Exception] { pairs(useFused = false) }
    assert(eComp.toString.toLowerCase.contains("divi"),
      s"compositional must raise divide-by-zero: $eComp")
    val eFused = intercept[Exception] { pairs(useFused = true) }
    assert(eFused.toString.toLowerCase.contains("division by zero") ||
      Option(eFused.getCause).exists(_.toString.toLowerCase.contains("division by zero")),
      s"fused must raise the same loud error: $eFused")
  }

  test("skew-salted partitioned mode == unsalted, byte-identical (r16 verdict #1)") {
    // a collapsed centroid: ~60% of the corpus forced into cell 0. With
    // skewSaltFactor = S > 1 the builder sub-splits hot cells into S
    // composite sub-cells (corpus rows one salt each, probe rows
    // replicated across all S) — the scored-pair SET is unchanged, so
    // pairs are identical and the RANKED top-k is identical (the salted
    // partial output is a larger superset the window rank collapses)
    val skewed = corpus.withColumn("cell",
      when(pmod(col("id"), lit(10)) < 6, lit(0L))
        .otherwise(pmod(col("id"), lit(8)).cast("long")))
    val corpusSide = skewed.select(col("id").as("corpus_id"), col("cell"),
      col("v").as("cv"))
    val probeSide = skewed.select(col("id").as("query_id"), col("v").as("qv"),
      col("cell"))
    def rankedTopK(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      shortlistVia(df, 5)
    // unsalted references
    val wantPairs = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99)
      .orderBy("query_id", "corpus_id").collect()
    assert(wantPairs.nonEmpty)
    val wantTopK = rankedTopK(SdcTopKPlan.partialTopKCosine(
      corpusSide, probeSide, 5))
    val (encC, qp, tbl) = fixture()
    val skewedEnc = encC.withColumn("cell",
      when(pmod(col("corpus_id"), lit(10)) < 6, lit(0L))
        .otherwise(col("cell")))
    val skewedQp = qp.withColumn("cell",
      when(pmod(col("query_id"), lit(10)) < 6, lit(0L))
        .otherwise(col("cell")))
    val tblB = VectorExpressions.sdcTableBroadcast(tbl)
    val wantSdc = shortlistVia(
      SdcTopKPlan.partialTopK(skewedEnc, skewedQp, tblB, m, ksub, 7), 7)
    spark.conf.set(SdcTopKPlan.skewSaltFactorKey, "4")
    try {
      val saltedPairs = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99)
        .orderBy("query_id", "corpus_id").collect()
      assert(saltedPairs === wantPairs)
      // topk: force partitioned so the salt engages (broadcast mode
      // never salts — it has no cell partitioning to skew)
      spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "-1")
      try {
        assert(rankedTopK(SdcTopKPlan.partialTopKCosine(
          corpusSide, probeSide, 5)) === wantTopK)
        assert(shortlistVia(SdcTopKPlan.partialTopK(
          skewedEnc, skewedQp, tblB, m, ksub, 7), 7) === wantSdc)
      } finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
      // end-to-end: the bucketed near-dup router under salting
      val want = graft.ext.Dedup.embeddingNearDupsBucketed(
        corpus, "v", "id", threshold = 0.99, nCells = 8, nProbe = 2,
        useFused = Some(false)).orderBy("id_a", "id_b").collect()
      val salted = graft.ext.Dedup.embeddingNearDupsBucketed(
        corpus, "v", "id", threshold = 0.99, nCells = 8, nProbe = 2,
        useFused = Some(true)).orderBy("id_a", "id_b").collect()
      assert(salted === want)
      // overflow guard: cell ids too large for the composite key skip
      // salting (logged) and still produce correct results
      val bigCells = corpusSide.withColumn("cell",
        col("cell") + lit(Long.MaxValue / 2))
      val bigProbes = probeSide.withColumn("cell",
        col("cell") + lit(Long.MaxValue / 2))
      val wantBig = SdcTopKPlan.pairsCosine(bigCells, bigProbes, 0.99)
        .orderBy("query_id", "corpus_id").collect()
      assert(wantBig.map(r => (r.getLong(0), r.getLong(1))) ===
        wantPairs.map(r => (r.getLong(0), r.getLong(1))))
    } finally spark.conf.unset(SdcTopKPlan.skewSaltFactorKey)
  }

  test("detectHotCells: cells at or above the fraction, and only those") {
    val counts = Seq((0L, 600L), (1L, 70L), (2L, 30L), (3L, 300L))
    assert(SdcTopKPlan.detectHotCells(counts, 1000L, 0.05) ===
      Seq(0L, 1L, 3L))
    assert(SdcTopKPlan.detectHotCells(counts, 1000L, 0.3) === Seq(0L, 3L))
    assert(SdcTopKPlan.detectHotCells(counts, 1000L, 0.7) === Seq.empty)
  }

  test("autoSaltFactor: 2x the hotness ratio, floored at 2, capped at 2x parallelism") {
    // 30% cell at frac=0.05 on 32 partitions: ratio 6 -> S = 12
    assert(SdcTopKPlan.autoSaltFactor(300L, 1000L, 0.05, 32) === 12)
    // barely hot (6%): ratio 1.2 -> ceil 2 -> S = 4 (mild split)
    assert(SdcTopKPlan.autoSaltFactor(60L, 1000L, 0.05, 32) === 4)
    // exactly at threshold: ratio 1 -> S = 2 (the floor)
    assert(SdcTopKPlan.autoSaltFactor(50L, 1000L, 0.05, 32) === 2)
    // a 90% cell at frac=0.01: ratio 90 -> 180, capped at 2*32 = 64
    assert(SdcTopKPlan.autoSaltFactor(900L, 1000L, 0.01, 32) === 64)
    // tiny parallelism still splits: cap max(2*1, 2) = 2
    assert(SdcTopKPlan.autoSaltFactor(900L, 1000L, 0.01, 1) === 2)
  }

  test("autoSaltFactor: extreme ratios stay positive and capped (no Int wrap)") {
    // ADVICE r17: a tiny frac pushes ratio past Int range, where the
    // old `2 * ceil(ratio).toInt` wrapped negative and max(2, ·)
    // collapsed S to 2 exactly when skew was worst. The all-Double form
    // must hit the parallelism cap instead.
    val s = SdcTopKPlan.autoSaltFactor(Long.MaxValue, Long.MaxValue, 1e-18, 32)
    assert(s === 64)
    assert(SdcTopKPlan.autoSaltFactor(1000000L, 1000000L, 1e-12, 16) === 32)
    // degenerate huge parallelism: Double min saturates, stays positive
    assert(SdcTopKPlan.autoSaltFactor(Long.MaxValue, Long.MaxValue, 1e-18,
      Int.MaxValue) > 0)
  }

  test("estCache LRU evicts past the cap (long-lived incremental sessions)") {
    // ADVICE r17: one distinct probe plan per incremental batch must
    // not accumulate forever in the per-session estimate memo.
    val lru = new SdcTopKPlan.EstLru
    (0 until SdcTopKPlan.estCacheMaxEntries + 10).foreach { i =>
      lru.put(Integer.valueOf(i), BigInt(i))
    }
    assert(lru.size() === SdcTopKPlan.estCacheMaxEntries)
    assert(!lru.containsKey(Integer.valueOf(0))) // eldest evicted
    // access order, not insert order: touching an old entry keeps it
    val k = Integer.valueOf(SdcTopKPlan.estCacheMaxEntries + 5)
    lru.get(k)
    lru.put(Integer.valueOf(-1), BigInt(1))
    assert(lru.containsKey(k))
  }

  test("detectionSource: conf/stats matrix (default on iff stats provided)") {
    import SdcTopKPlan.detectionSource
    // unset conf: free detection from stats, never a lineage pass
    assert(detectionSource(None, statsPresent = true) === "stats")
    assert(detectionSource(None, statsPresent = false) === "none")
    // explicit auto: r17 opt-in — pays the pass when no stats
    assert(detectionSource(Some("auto"), statsPresent = true) === "stats")
    assert(detectionSource(Some("AUTO"), statsPresent = false) === "pass")
    // explicit fixed S
    assert(detectionSource(Some("8"), statsPresent = true) === "stats")
    assert(detectionSource(Some("8"), statsPresent = false) === "pass")
    // disabled forms win over stats
    assert(detectionSource(Some("off"), statsPresent = true) === "none")
    assert(detectionSource(Some("0"), statsPresent = true) === "none")
    assert(detectionSource(Some("1"), statsPresent = true) === "none")
  }

  test("detectHotCellsAuto: balanced small-nCells layouts are never hot") {
    import SdcTopKPlan.detectHotCellsAuto
    // 16 perfectly balanced cells at P=32: every share (6.25%) clears
    // the 5% absolute fraction — the r17 rule would salt ALL of them —
    // but each cell's pair work is only 2x the fair task share < 3x
    val balanced = (0L until 16L).map(c => (c, 1000L))
    val sqB = balanced.map { case (_, n) => n.toDouble * n.toDouble }.sum
    assert(detectHotCellsAuto(balanced, 16000L, sqB, 0.05, 32) === Seq.empty)
    // the measured r17 fixture: a 30% collapsed cell among 63 cold ones
    val skewed = (0L, 60000L) +: (1L until 64L).map(c => (c, 2222L))
    val sqS = skewed.map { case (_, n) => n.toDouble * n.toDouble }.sum
    assert(detectHotCellsAuto(skewed, 200000L, sqS, 0.05, 32) === Seq(0L))
    // the mild 8% cell is still caught at P=32 (r17 measured x4 there)
    val mild = (0L, 16000L) +: (1L until 64L).map(c => (c, 2921L))
    val sqM = mild.map { case (_, n) => n.toDouble * n.toDouble }.sum
    assert(detectHotCellsAuto(mild, 200000L, sqM, 0.05, 32) === Seq(0L))
    // sub-fraction cells never qualify no matter the work concentration
    assert(detectHotCellsAuto(Seq((0L, 40L), (1L, 1L)), 10000L,
      1601.0, 0.05, 32) === Seq.empty)
  }

  test("unset conf + CellStats: salts from stats, byte-identical; no stats = no-op") {
    val skewed = corpus.withColumn("cell",
      when(pmod(col("id"), lit(10)) < 6, lit(0L))
        .otherwise(pmod(col("id"), lit(8)).cast("long")))
    val corpusSide = skewed.select(col("id").as("corpus_id"), col("cell"),
      col("v").as("cv"))
    val probeSide = skewed.select(col("id").as("query_id"), col("v").as("qv"),
      col("cell"))
    // stats as the builder would hand them over: per-cell counts
    val counts = skewed.groupBy(col("cell")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val stats = SdcTopKPlan.CellStats(counts, counts.map(_._2).sum)
    spark.conf.unset(SdcTopKPlan.skewSaltFactorKey)
    // reference: explicitly disabled
    spark.conf.set(SdcTopKPlan.skewSaltFactorKey, "off")
    val want = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99,
        cellStats = Some(stats))
      .orderBy("query_id", "corpus_id").collect()
    assert(SdcTopKPlan.lastSaltDecision === "unsalted")
    spark.conf.unset(SdcTopKPlan.skewSaltFactorKey)
    // default conf + stats: engages (free detection), same bytes
    val got = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99,
      cellStats = Some(stats))
    assert(SdcTopKPlan.lastSaltDecision.startsWith("salted"),
      s"expected stats-driven salting, got '${SdcTopKPlan.lastSaltDecision}'")
    assert(SdcTopKPlan.lastSaltDecision.endsWith("src=stats"))
    assert(got.orderBy("query_id", "corpus_id").collect() === want)
    // default conf without stats: old default — structurally untouched
    SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99)
      .queryExecution.executedPlan // force build
    assert(SdcTopKPlan.lastSaltDecision === "unsalted")
  }

  test("skewSaltFactor=auto == unsalted, byte-identical; no-op on balanced") {
    // same collapsed-centroid fixture as the fixed-S salting spec, but
    // S computed from the measured hottest cell (~60% at frac=0.05 on
    // the suite's 4 shuffle partitions: ratio 12 -> S = min(8, 24) = 8)
    val skewed = corpus.withColumn("cell",
      when(pmod(col("id"), lit(10)) < 6, lit(0L))
        .otherwise(pmod(col("id"), lit(8)).cast("long")))
    val corpusSide = skewed.select(col("id").as("corpus_id"), col("cell"),
      col("v").as("cv"))
    val probeSide = skewed.select(col("id").as("query_id"), col("v").as("qv"),
      col("cell"))
    val wantPairs = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99)
      .orderBy("query_id", "corpus_id").collect()
    assert(wantPairs.nonEmpty)
    val wantTopK = shortlistVia(SdcTopKPlan.partialTopKCosine(
      corpusSide, probeSide, 5), 5)
    spark.conf.set(SdcTopKPlan.skewSaltFactorKey, "auto")
    try {
      val saltedPairs = SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.99)
      // explicit auto without stats = the r17 opt-in: detection pays
      // the lineage pass and must actually engage on this fixture
      assert(SdcTopKPlan.lastSaltDecision.endsWith("src=pass"),
        s"expected pass-driven salting, got '${SdcTopKPlan.lastSaltDecision}'")
      assert(saltedPairs.orderBy("query_id", "corpus_id").collect() === wantPairs)
      spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "-1")
      try {
        assert(shortlistVia(SdcTopKPlan.partialTopKCosine(
          corpusSide, probeSide, 5), 5) === wantTopK)
      } finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
      // balanced cells: 1/8 shares clear the 5% absolute fraction, but
      // the auto path's pair-work criterion (detectHotCellsAuto) keeps
      // balance from reading as skew — structural no-op at the DEFAULT
      // fraction (this is what makes default-on detection safe)
      locally {
        val balancedSide = corpus.withColumn("cell",
            pmod(col("id"), lit(8)).cast("long"))
          .select(col("id").as("corpus_id"), col("cell"), col("v").as("cv"))
        val balancedProbes = corpus.withColumn("cell",
            pmod(col("id"), lit(8)).cast("long"))
          .select(col("id").as("query_id"), col("v").as("qv"), col("cell"))
        val noSalt = SdcTopKPlan.pairsCosine(balancedSide, balancedProbes, 0.99)
        // no hot cell -> the builder returns the frames unchanged: the
        // plan must carry no salted composite-cell arithmetic
        assert(SdcTopKPlan.lastSaltDecision === "unsalted")
        assert(!noSalt.queryExecution.analyzed.toString.contains("__salt"))
        assert(noSalt.orderBy("query_id", "corpus_id").collect().nonEmpty)
      }
    } finally spark.conf.unset(SdcTopKPlan.skewSaltFactorKey)
  }

  test("fused UNORDERED pair scan == compositional batch-vs-store join, byte-identical") {
    // the incremental shape: an incoming batch probed against a store.
    // Ids OVERLAP across the sides (store 0..149, batch 100..199) — the
    // compositional equi-join has no id conjunct, so colliding ids pair
    // like any other rows and the fused path must NOT self-exclude
    val store = corpus.filter(col("id") < 150)
    val batch = corpus.filter(col("id") >= 100)
    def run(useFused: Boolean) =
      graft.ext.Dedup.embeddingNearDupsAgainst(
        batch, store, "v", "id", threshold = 0.99, nCells = 8, nProbe = 2,
        useFused = Some(useFused))
        .orderBy("id_new", "id_store").collect()
    val want = run(useFused = false)
    assert(want.nonEmpty, "fixture must produce batch-vs-store pairs")
    // overlapping ids must be able to pair with THEMSELVES (cos = 1)
    assert(want.exists(r => r.getLong(0) == r.getLong(1)),
      "overlap fixture must exercise colliding ids")
    assert(run(useFused = true) === want)
    // default routing is fused; a small batch stays broadcast (the
    // store streams shuffle-free), and forcing partitioned via the
    // threshold lever is result-invisible
    val dflt = graft.ext.Dedup.embeddingNearDupsAgainst(
      batch, store, "v", "id", threshold = 0.99, nCells = 8, nProbe = 2)
    val plan = dflt.queryExecution.executedPlan.toString
    assert(plan.contains("ProbeTopK"), s"Against path not fused:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"a tiny batch must ride the broadcast mode:\n$plan")
    assert(dflt.orderBy("id_new", "id_store").collect() === want)
    spark.conf.set(SdcTopKPlan.probeBroadcastThresholdKey, "-1")
    try assert(run(useFused = true) === want)
    finally spark.conf.unset(SdcTopKPlan.probeBroadcastThresholdKey)
  }

  test("non-ANSI sessions reroute to the compositional plan (r16 advice)") {
    // the fused cosine scorers replicate the ANSI Divide's raise on a
    // zero-norm denominator; with ANSI off the compositional Divide
    // NULL-drops that pair instead — the router must keep the session's
    // own semantics, and building the fused node directly must refuse
    val base = (0 until 40).map(i => (i.toLong, Seq.fill(dim)(0.5f + i * 0.001f)))
    val zeros = Seq((100L, Seq.fill(dim)(0f)), (101L, Seq.fill(dim)(0f)))
    val embs = (base ++ zeros).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    val corpusSide = embs.select(col("id").as("corpus_id"),
      lit(0L).as("cell"), col("v").as("cv"))
    val probeSide = embs.select(col("id").as("query_id"),
      col("v").as("qv"), lit(0L).as("cell"))
    assert(SdcTopKPlan.cosineLayoutSupported(corpusSide, probeSide),
      "ANSI session with the pinned layout must route fused")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      assert(!SdcTopKPlan.cosineLayoutSupported(corpusSide, probeSide),
        "non-ANSI session must report the fused layout unsupported")
      intercept[IllegalArgumentException] {
        SdcTopKPlan.pairsCosine(corpusSide, probeSide, 0.9)
      }
      // the near-dup router (useFused = None) keeps the compositional
      // plan, whose non-ANSI Divide silently DROPS the zero-norm pair
      // instead of raising — the session's own semantics
      val pairs = graft.ext.Dedup.embeddingNearDupsBucketed(
        embs, "v", "id", threshold = 0.9999, nCells = 2, nProbe = 2)
        .collect()
      assert(!pairs.exists(r => r.getLong(0) == 100L || r.getLong(1) == 101L),
        "non-ANSI compositional plan must NULL-drop zero-norm pairs")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("ProbeIndex cache keys on layout, not just broadcast identity (r15 advice)") {
    // one broadcast rows array served to two execs with DIFFERENT
    // column layouts must build two indexes — before the fix the
    // second silently reused the first's (stale column positions)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    def row(id: Long, codes: Array[Int], cell: Long): InternalRow =
      InternalRow(id, ArrayData.toArrayData(codes), cell)
    // layout A: (id@0, codes@1, cell@2); layout B reads cell from 0 and
    // id from 2 — same rows, different positions
    val rows = Array(
      row(1L, Array(0, 1), 7L),
      row(2L, Array(1, 0), 7L))
    val a = graft.plans.ProbeIndex.codes(rows, m = 2, qIdIdx = 0, qPayIdx = 1, cellIdx = 2)
    val b = graft.plans.ProbeIndex.codes(rows, m = 2, qIdIdx = 2, qPayIdx = 1, cellIdx = 0)
    assert(a ne b, "different layouts over one broadcast must not share an index")
    assert(a.get(7L).map(_.id).toSet === Set(1L, 2L))
    assert(b.get(1L).map(_.id).toSet === Set(7L)) // id read from cell position
    // same layout twice: cached instance reused
    val a2 = graft.plans.ProbeIndex.codes(rows, m = 2, qIdIdx = 0, qPayIdx = 1, cellIdx = 2)
    assert(a eq a2, "identical layout must hit the cache")
    // vecs cache: same contract
    def vrow(id: Long, v: Array[Float], cell: Long): InternalRow =
      InternalRow(id, ArrayData.toArrayData(v), cell)
    val vrows = Array(vrow(3L, Array(1f, 0f), 9L))
    val va = graft.plans.ProbeIndex.vecs(vrows, qIdIdx = 0, qPayIdx = 1, cellIdx = 2)
    val vb = graft.plans.ProbeIndex.vecs(vrows, qIdIdx = 2, qPayIdx = 1, cellIdx = 0)
    assert(va ne vb)
    assert(va.get(9L).head.id === 3L && vb.get(3L).head.id === 9L)
  }

  test("TopKHeap keeps exactly the top-C under (score desc, id asc) with ties") {
    val rnd = new scala.util.Random(5)
    val entries = (0 until 500).map(i => (rnd.nextInt(20) / 10.0, i.toLong))
    val h = new TopKHeap(25)
    entries.foreach { case (s, id) => h.offer(s, id) }
    val kept = (0 until h.size).map(i => (h.scoreAt(i), h.idAt(i))).toSet
    val want = entries.sortBy { case (s, id) => (-s, id) }.take(25).toSet
    assert(kept === want)
    // capacity larger than input: everything kept
    val h2 = new TopKHeap(1000)
    entries.foreach { case (s, id) => h2.offer(s, id) }
    assert(h2.size === 500)
  }
}
