package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine math: orthogonal=0, identical=1") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val out = df.as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks nearest first and excludes self") {
    val out = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2) === Array(1L, 4L, 2L)) // 0.994, 0.707, 0.0
    assert(out.map(_._4) === Array(1, 2, 3))
    assert(!out.map(_._2).contains(0L))
  }

  test("hardNegatives: nearest DIFFERENT-label vectors, null label negates any") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), "A"),
      (1L, Array(0.9f, 0.1f), "A"),              // same label: excluded
      (2L, Array(0.0f, 1.0f), "B"),              // orthogonal negative
      (3L, Array(0.8f, 0.2f), "B"),              // close negative
      (4L, Array(1.0f, 0.05f), null.asInstanceOf[String]) // unlabeled: valid
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(labeled,
        labeled.filter(col("vec_id") === 0), "embedding", "vec_id", "label",
        k = 2)
      .orderBy("rank").collect()
    // nearest non-A: 4 (cos ~0.99875) then 3 (cos ~0.97014); 1 is
    // label A and must never appear even though it is the closest
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 3L))
    assert(out.map(_.getInt(5)).toSeq == Seq(1, 2))
    assert(out(0).getString(1) == "A" && out(0).isNullAt(3))
    val all = Similarity.hardNegatives(labeled,
      labeled.filter(col("vec_id") === 0), "embedding", "vec_id", "label",
      k = 10).collect()
    assert(!all.map(_.getLong(2)).contains(1L) &&
      !all.map(_.getLong(2)).contains(0L))
  }

  test("IVF recall@10 under partial probing meets the bound on clustered embeddings") {
    val rnd = new scala.util.Random(7)
    // 8 well-separated clusters × 40 points — the corpus shape IVF
    // exists for (Lloyd steps snap the hash-seeded centroids onto them)
    val centers = (0 until 8).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val rows = for (c <- 0 until 8; i <- 0 until 40) yield
      ((c * 40 + i).toLong, centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f))
    val embs = rows.toDF("vec_id", "embedding")
    val queries = embs.filter(col("vec_id") % 40 === 0) // one per cluster
    val cents = Similarity.refineCentroids(embs,
      Similarity.coarseCentroids(embs, "embedding", "vec_id", nCells = 8),
      "embedding", "vec_id", iterations = 2)
    val assigned = Similarity.assignCells(embs, cents, "embedding", "vec_id")
    val ivf = Similarity.ivfTopK(assigned, cents, queries,
      "embedding", "vec_id", k = 10, nProbe = 2)
    val brute = Similarity.bruteForceTopK(embs, queries, "embedding", "vec_id", k = 10)
    val recalls = Similarity.recallAtK(ivf, brute).as[(Long, Double)].collect().toMap
    assert(recalls.size === 8)
    val mean = recalls.values.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean below 0.9 (per-query: $recalls)")
  }

  test("refineCentroidsWithStats: free per-cell counts match a direct count pass") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val embs = rows.toDF("vec_id", "embedding")
    val init = Similarity.coarseCentroids(embs, "embedding", "vec_id", nCells = 4)
    val (cents, statsOpt) = Similarity.refineCentroidsWithStats(
      embs, init, "embedding", "vec_id", iterations = 2)
    // same centroids as the stats-less form (byte-identical refinement)
    val plain = Similarity.refineCentroids(embs, init,
      "embedding", "vec_id", iterations = 2)
    assert(cents.orderBy("cell").collect() === plain.orderBy("cell").collect())
    val stats = statsOpt.getOrElse(fail("no stats from a 2-iteration refine"))
    assert(stats.total === 120L)
    // the counts describe the PENULTIMATE assignment (the final
    // re-centering shifts one more step): recompute that assignment
    // directly — one extra refine stopped one step earlier
    val prev = Similarity.refineCentroids(embs, init,
      "embedding", "vec_id", iterations = 1)
    val want = Similarity.assignCells(embs, prev, "embedding", "vec_id")
      .groupBy("cell").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stats.counts.toMap === want)
    // zero iterations: no assignment pass ran, so no stats
    assert(Similarity.refineCentroidsWithStats(embs, init,
      "embedding", "vec_id", iterations = 0)._2.isEmpty)
  }

  test("kmeansParallelInit: finds sparse clusters hash seeding misses, deterministic") {
    val rnd = new scala.util.Random(11)
    // skewed clusters (300 / 12 / 6 points): density-proportional hash
    // seeding tends to spend all its seeds in the big cluster; the
    // d2-weighted oversampling must reach the two sparse ones
    val centers = Seq(
      Array.fill(8)(rnd.nextGaussian().toFloat * 5),
      Array.fill(8)(rnd.nextGaussian().toFloat * 5),
      Array.fill(8)(rnd.nextGaussian().toFloat * 5))
    val sizes = Seq(300, 12, 6)
    val rows = for (c <- 0 until 3; i <- 0 until sizes(c)) yield
      ((c * 1000 + i).toLong,
        centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.2f))
    val embs = rows.toDF("vec_id", "embedding")
    val init = Similarity.kmeansParallelInit(embs, "embedding", "vec_id", k = 3)
    assert(init.count() === 3)
    val cents = Similarity.refineCentroids(embs, init,
      "embedding", "vec_id", iterations = 1)
    val assigned = Similarity.assignCells(embs, cents, "embedding", "vec_id")
      .withColumn("truth", (col("corpus_id") / 1000).cast("int"))
    // every true cluster must own at least one DISTINCT cell: no sparse
    // cluster may be absorbed into the dense one's centroid
    val cellsPerTruth = assigned.groupBy("truth")
      .agg(countDistinct(col("cell")).as("nc"), count(lit(1)).as("n"))
      .orderBy("truth").as[(Int, Long, Long)].collect()
    assert(cellsPerTruth.map(_._3) === Array(300L, 12L, 6L))
    // purity: each truth cluster's points agree on one cell, and the
    // three clusters use three different cells
    val majority = assigned.groupBy("truth", "cell").count()
      .orderBy(col("count").desc).as[(Int, Long, Long)].collect()
    val topPerTruth = majority.groupBy(_._1).map { case (t, rs) =>
      t -> rs.maxBy(_._3) }
    assert(topPerTruth.values.map(_._2).toSet.size === 3,
      s"clusters collapsed onto shared cells: ${majority.toSeq}")
    assert(topPerTruth.values.map(_._3).sum >= 316,
      s"purity too low: ${majority.toSeq}")
    // determinism: a second run returns byte-identical centroids
    val again = Similarity.kmeansParallelInit(embs, "embedding", "vec_id", k = 3)
    assert(init.orderBy("cell").collect().toSeq ===
      again.orderBy("cell").collect().toSeq)
  }

  test("kmeansParallelInit: sampled driver path equals the distributed path on a covered corpus") {
    // the sampled (sampleCap>0) path runs rounds/weights/Gonzalez as
    // driver loops; when the sample covers the whole corpus its picks
    // must be BYTE-IDENTICAL to the distributed (sampleCap=0) path —
    // same FNV u, same log(u)/w keys, same left-to-right double dot
    // accumulation, same tie orders. Divergence = one implementation
    // drifted.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val dist = Similarity.kmeansParallelInit(df, "embedding", "vec_id",
      k = 5, rounds = 2)
    val samp = Similarity.kmeansParallelInit(df, "embedding", "vec_id",
      k = 5, rounds = 2, sampleCap = 4096)
    assert(dist.orderBy("cell").collect().toSeq ===
      samp.orderBy("cell").collect().toSeq)
  }

  test("assignCells beyond 128 cells: chunked inline argmax, shuffle-free, matches brute cosine") {
    // > InlineAssignMaxCells centroids must route through the chunked
    // inline path: per-row argmax identical to an independent cosine
    // ranking (highest cos, tie to lowest cell), and the plan must be
    // a pure narrow map — no Exchange, no Window (the old fallback
    // crossJoin+window shuffled n×nCells rows)
    val rnd = new scala.util.Random(13)
    val n = 300
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(6)(rnd.nextGaussian().toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val cents = (0 until n).map(i =>
      (i.toLong, Array.fill(6)(rnd.nextGaussian()).toSeq))
      .toDF("cell", "centroid")
    val assigned = Similarity.assignCells(corpus, cents, "embedding", "vec_id")
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunked assign must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"chunked assign must not window:\n$plan")
    // independent ground truth: driver-side cosine argmax
    val centRows = cents.orderBy("cell").collect()
    val centArr = (0 until n).map(i =>
      (i.toLong, centRows(i).getSeq[Double](1).map(_.toFloat).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val expect = vecs.map { case (id, v) =>
      id -> centArr.minBy { case (cell, cv) => (-cos(v, cv), cell) }._1
    }.toMap
    val got = assigned.select("corpus_id", "cell")
      .as[(Long, Long)].collect().toMap
    assert(got === expect)
  }

  test("nearestCellsTopK probe selection matches an independent cosine ranking") {
    // the query-probe kernel must pick the same nProbe cells, in the
    // same best-first order, as a full (cos desc, cell asc) ranking —
    // including tie behavior (lower cell wins)
    val rnd = new scala.util.Random(17)
    val nCells = 100
    val dim = 6
    val centVals = (0 until nCells).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val cents = centVals.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "centroid")
    val queries = (0 until 30).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val assignedDummy = queries.select(col("vec_id").as("corpus_id"),
      col("embedding").as("cv"), lit(0L).as("cell"))
    // use ivfTopK's internals indirectly: build the flat matrix the same way
    val centsF = centVals.map { case (c, v) => (c, v.map(_.toFloat)) }
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    val flat = centsF.flatMap { case (_, v) => unit(v) }.toArray
    val got = queries.select(col("vec_id"),
        graft.functions.VectorExpressions.nearestCellsTopK(
          col("embedding"), flat, centsF.map(_._1).toArray, dim, 7).as("pcs"))
      .as[(Long, Seq[(Long, Double)])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val qArr = queries.as[(Long, Array[Float])].collect()
    qArr.foreach { case (qid, qv) =>
      val expect = centsF
        .map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, d) => (-d, c) }
        .take(7).map(_._1)
      assert(got(qid).map(_._1) === expect, s"query $qid probe set diverged")
    }
  }

  test("kernel NaN contract: NaN dots never rank; assignment falls back, probing skips") {
    // dim=2 matrix: cell 5 is a NaN centroid (only NaN/Inf inputs can
    // produce one), cells 6/7 finite. A finite query must rank ONLY
    // the finite cells (the NaN cell is skipped, never parked
    // un-displaceably in the top-k buffer); an all-NaN query probes
    // ZERO cells but still ASSIGNS to the lowest cell.
    val units = Array(Float.NaN, Float.NaN, 1.0f, 0.0f, 0.0f, 1.0f)
    val cells = Array(5L, 6L, 7L)
    val df = Seq(
      (0L, Array(1.0f, 0.25f)),
      (1L, Array(Float.NaN, 0.0f))).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        graft.functions.VectorExpressions.nearestCell(
          col("embedding"), units, cells, 2).as("cell"),
        graft.functions.VectorExpressions.nearestCellsTopK(
          col("embedding"), units, cells, 2, 3).as("pcs"))
      .as[(Long, Long, Seq[(Long, Double)])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L)._1 === 6L)
    assert(out(0L)._2.map(_._1) === Seq(6L, 7L), "NaN cell must be skipped")
    assert(out(1L)._1 === 5L, "all-NaN assignment falls back to the lowest cell")
    assert(out(1L)._2.isEmpty, "all-NaN query must probe zero cells")
  }

  test("trainedCentroids: sampleCap floor-clamps instead of tripping the k-means|| require") {
    // sampleCap=1 is below the k-means|| minimum for k=40 (2k=80) —
    // the old default-vs-k trap (any nCells > sampleCap/2 threw); now
    // the cap is raised to the minimum and the build returns exactly k
    val rnd = new scala.util.Random(3)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cents = Similarity.trainedCentroids(df, "embedding", "vec_id",
      nCells = 40, sampleCap = 1, lloyd = 0)
    assert(cents.count() === 40L)
  }

  test("cell-partitioned store: probes prune partitions, results match in-memory IVF") {
    val store = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/assigned"
    val centroids = Similarity.coarseCentroids(embs, "embedding", "vec_id", nCells = 4)
    val assigned = Similarity.assignCells(embs, centroids, "embedding", "vec_id")
    Similarity.writeAssigned(assigned, store)
    val q = embs.filter(col("vec_id") === 0)
    val fromStore = Similarity.ivfTopKFromStore(spark, store, centroids, q,
      "embedding", "vec_id", k = 3, nProbe = 2)
    val inMem = Similarity.ivfTopK(assigned, centroids, q,
      "embedding", "vec_id", k = 3, nProbe = 2)
    assert(fromStore.orderBy("rank").collect() === inMem.orderBy("rank").collect())
    // the probed-cell predicate must reach the scan as a PARTITION filter
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"store scan is not partition-pruned:\n$plan")
  }

  test("appendAssigned: incremental store == one-shot store for probes") {
    // daily-ingest: build from a slice, append the rest with the SAME
    // centroids — query results must match the one-shot store
    val base = java.nio.file.Files.createTempDirectory("graft-ivfappend").toString
    val centroids = Similarity.coarseCentroids(embs, "embedding", "vec_id", nCells = 4)
    val oneShot = s"$base/oneshot"
    Similarity.writeAssigned(
      Similarity.assignCells(embs, centroids, "embedding", "vec_id"), oneShot)
    val incr = s"$base/incr"
    Similarity.writeAssigned(
      Similarity.assignCells(embs.filter(col("vec_id") < 2), centroids,
        "embedding", "vec_id"), incr)
    Similarity.appendAssigned(embs.filter(col("vec_id") >= 2), centroids,
      "embedding", "vec_id", incr)
    // a retried append with skipExistingIds must be a no-op
    Similarity.appendAssigned(embs.filter(col("vec_id") >= 2), centroids,
      "embedding", "vec_id", incr, skipExistingIds = true)
    val q = embs.filter(col("vec_id") === 0)
    def run(p: String) = Similarity.ivfTopKFromStore(spark, p, centroids, q,
        "embedding", "vec_id", k = 3, nProbe = 2)
      .orderBy("rank").collect()
    assert(run(incr) === run(oneShot))
  }

  test("IVF probe returns self-consistent top-k from probed cells") {
    val centroids = Similarity.coarseCentroids(embs, "embedding", "vec_id", nCells = 2)
    val assigned = Similarity.assignCells(embs, centroids, "embedding", "vec_id")
    assert(assigned.count() === 5) // every vector lands in exactly one cell
    val out = Similarity.ivfTopK(assigned, centroids,
        embs.filter(col("vec_id") === 0), "embedding", "vec_id", k = 3, nProbe = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // probing ALL cells (nProbe = nCells) must equal brute force
    val brute = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out === brute)
  }

  test("kmeansAssign: every vector once, to its provably nearest centroid") {
    val out = Similarity.kmeansAssign(embs, "embedding", "vec_id", k = 2)
    val rows = out.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).distinct.length === 5) // one row per id
    assert(rows.forall(r => r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9))
    // argmax check: re-score every (id, centroid) pair independently;
    // the chosen cell's cos must be the max (ties toward lower cell)
    val cents = Similarity.meanVectors(embs.select(
      Similarity.hashCells(col("vec_id"), 2).as("cell"), col("embedding").as("v")))
    val all = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
      .crossJoin(cents)
      .withColumn("cos", round(Similarity.cosine(col("v"), col("centroid")), 6))
      .select("id", "cell", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (r <- rows) {
      val (id, cell, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val best = all.filter(_._1 == id).map(_._3).max
      assert(cos == best, s"id $id assigned cos $cos but best is $best")
      val winners = all.filter(t => t._1 == id && t._3 == best).map(_._2).min
      assert(cell == winners, s"id $id tie-break picked $cell, expected $winners")
    }
  }

  test("kmeansAssign is byte-identical under repartitioning") {
    val a = Similarity.kmeansAssign(embs, "embedding", "vec_id", k = 2)
      .orderBy("id").collect().toSeq
    val b = Similarity.kmeansAssign(embs.repartition(7), "embedding", "vec_id", k = 2)
      .orderBy("id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("meanPool: hand-computed per-group per-dim means") {
    import spark.implicits._
    val chunks = Seq(
      (0L, Array(1.0f, 3.0f)), (0L, Array(3.0f, 5.0f)),  // doc 0 -> [2, 4]
      (1L, Array(10.0f, -2.0f))                          // doc 1 -> itself
    ).toDF("doc", "embedding")
    val got = Similarity.meanPool(chunks, "embedding", col("doc"))
      .orderBy("group")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got(0) == ((0L, Seq(2.0, 4.0))))
    assert(got(1) == ((1L, Seq(10.0, -2.0))))
  }

  test("randomProject: a unit basis vector reads the sign matrix back") {
    import spark.implicits._
    // x = e_i  =>  y_j = scale * s_ij: the projection of a one-hot
    // vector IS row i of the (scaled) sign matrix
    val i = 5
    val vec = Array.tabulate(16)(k => if (k == i) 1.0f else 0.0f)
    val out = Similarity.randomProject(
      Seq((7L, vec)).toDF("vec_id", "embedding"), "embedding", "vec_id",
      dIn = 16, kOut = 4)
      .orderBy("dim").collect()
    assert(out.length === 4)
    out.zipWithIndex.foreach { case (r, j) =>
      assert(r.getLong(0) === 7L && r.getInt(1) === j)
      assert(r.getDouble(2) === 0.5 * Similarity.rpSign(i, j)) // 1/sqrt(4)
    }
  }

  test("randomProject: rejects a non-power-of-4 output dim") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.randomProject(df, "embedding", "vec_id", dIn = 1, kOut = 8))
  }

  test("rpSign: not striped by (i+j) parity, roughly balanced") {
    val signs = for (i <- 0 until 64; j <- 0 until 16)
      yield Similarity.rpSign(i, j)
    val pos = signs.count(_ == 1.0)
    assert(pos > 400 && pos < 624, s"sign balance off: $pos/1024 positive")
    // a striped matrix has sign(i,j) == sign(i+1,j+1) everywhere
    val diagEqual = (for (i <- 0 until 63; j <- 0 until 15)
      yield Similarity.rpSign(i, j) == Similarity.rpSign(i + 1, j + 1))
      .count(x => x)
    assert(diagEqual < 900, s"sign matrix is diagonally striped: $diagEqual/945")
  }

  test("projDistortion: duplicate vectors are excluded, scaling is unbiased on axes") {
    import spark.implicits._
    // two identical vectors + one distinct: only the 2 mixed pairs
    // remain (the 0/0 pair is filtered), and each has a well-defined
    // positive ratio
    val a = Array.tabulate(16)(k => if (k == 0) 2.0f else 0.0f)
    val b = Array.tabulate(16)(k => if (k == 3) 1.0f else 0.0f)
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("vec_id", "embedding")
    val r = Similarity.projDistortion(df, "embedding", "vec_id",
      dIn = 16, kOut = 4, lo = 0.0, hi = 10.0, minFracInBand = 1.0,
      meanLo = 0.0, meanHi = 10.0).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(2) > 0.0)
    assert(r.getBoolean(5) && r.getBoolean(6))
  }
}
