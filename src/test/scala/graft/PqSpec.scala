package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16; private val m = 4; private val ksub = 8

  /** 8 well-separated cluster anchors, 25 points each, deterministic
    * jitter — the clustered regime PQ exists for.
    */
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val anchors = Array.fill(8, dim)(rnd.nextFloat() * 10f - 5f)
    val rows = (0 until 200).map { i =>
      val a = anchors(i % 8)
      (i.toLong, a.map(x => x + rnd.nextFloat() * 0.4f - 0.2f).toSeq)
    }
    rows.toDF("id", "v").withColumn("v", Pq.normalized(col("v").cast("array<float>")))
  }

  private lazy val cb = Pq.trainCodebooks(corpus, "v", "id", dim, m, ksub, iterations = 2)
  private lazy val enc = Pq.encode(corpus, cb, "v", "id", dim, m, ksub)

  test("codebook shape: m subspaces, ≤ ksub codes each, centroids of dim/m") {
    val rows = cb.select("sub", "code", "centroid")
      .as[(Int, Int, Seq[Double])].collect()
    assert(rows.map(_._1).distinct.sorted === (0 until m))
    rows.foreach { case (_, code, c) =>
      assert(code >= 0 && code < ksub)
      assert(c.length === dim / m)
    }
  }

  test("codes are dense, in range, and byte-stable across partitioning") {
    val codes = enc.select("id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes.length === 200)
    codes.foreach { case (_, cs) =>
      assert(cs.length === m && cs.forall(c => c >= 0 && c < ksub))
    }
    val codes7 = Pq.encode(corpus.repartition(7), cb, "v", "id", dim, m, ksub)
      .select("id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes7.sortBy(_._1).toSeq === codes.sortBy(_._1).toSeq)
  }

  test("ADC score equals exact dot product against the decoded vector") {
    // the defining property of asymmetric distance: LUT-sum == ⟨q, decode(x)⟩
    val q = corpus.filter(col("id") < 3)
    val adc = Pq.adcTopK(enc, cb, q, "v", "id", k = 200, dim, m, ksub,
        excludeSelf = false)
      .select("query_id", "corpus_id", "adc").as[(Long, Long, Double)].collect()
    val dec = Pq.decode(enc, cb, dim, m, ksub).select(col("id"), col("recon"))
    val exact = q.select(col("id").as("query_id"), col("v").as("qv"))
      .crossJoin(dec)
      .select(col("query_id"), col("id").as("corpus_id"),
        Similarity.dot(col("qv"), col("recon")).as("d"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, d) => ((a, b), d) }.toMap
    assert(adc.nonEmpty)
    adc.foreach { case (qid, cid, s) =>
      assert(math.abs(s - exact((qid, cid))) < 1e-5,
        s"ADC $s vs exact-decoded ${exact((qid, cid))} for ($qid,$cid)")
    }
  }

  test("quantization error: decoded vectors stay close to originals on clustered data") {
    val dec = Pq.decode(enc, cb, dim, m, ksub)
    val err = dec.select(
        sqrt(aggregate(zip_with(col("v"), col("recon"),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x)).as("e"))
      .agg(avg("e")).as[Double].first()
    // unit vectors; separated clusters quantize to ≪ unit error
    assert(err < 0.35, s"mean reconstruction L2 error $err")
  }

  test("shortlist recall: exact top-10 sits inside the ADC top-30") {
    // tight clusters make same-cluster rows ADC near-ties, so raw ADC
    // top-10 is tie-break noise (≈10/24 here) — the metric that governs
    // the re-rank pipeline is whether the true neighbors reach the
    // shortlist at all
    val q = corpus.filter(col("id") < 10)
    val short = Pq.adcTopK(enc, cb, q, "v", "id", k = 30, dim, m, ksub)
    val exact = Similarity.bruteForceTopK(corpus, q, "v", "id", k = 10)
    val recall = Similarity.recallAtK(short, exact)
      .agg(avg("recall")).as[Double].first()
    assert(recall >= 0.9, s"shortlist recall@10-in-30 $recall")
  }

  test("IVF-PQ residual index: probe+ADC+re-rank recall@10 ≥ 0.9") {
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 16),
      "v", "id", iterations = 1)
    val (rcb, enc) = Pq.ivfPqIndex(corpus, cents, "v", "id", dim, m, ksub)
    // the index stores cell + m small ints per vector, nothing else
    assert(enc.columns.toSeq === Seq("id", "cell", "codes"))
    assert(enc.count() === 200)
    val q = corpus.filter(col("id") < 10)
    val reranked = Pq.ivfPqRerankTopK(enc, cents, rcb, q, corpus, "v", "id",
      k = 10, shortlistK = 30, nProbe = 4, dim = dim, m = m, ksub = ksub)
    val exact = Similarity.bruteForceTopK(corpus, q, "v", "id", k = 10)
    val recall = Similarity.recallAtK(reranked, exact)
      .agg(avg("recall")).as[Double].first()
    assert(recall >= 0.9, s"IVF-PQ re-ranked recall@10 $recall")
  }

  test("ADC shortlist + exact re-rank: recall@10 ≥ 0.9") {
    val q = corpus.filter(col("id") < 10)
    val reranked = Pq.adcRerankTopK(enc, cb, q, corpus, "v", "id",
      k = 10, shortlistK = 30, dim, m, ksub)
    val exact = Similarity.bruteForceTopK(corpus, q, "v", "id", k = 10)
    val recall = Similarity.recallAtK(reranked, exact)
      .agg(avg("recall")).as[Double].first()
    assert(recall >= 0.9, s"re-ranked recall@10 $recall")
  }

  test("SDC score equals the exact dot of the two decoded vectors") {
    // the defining SDC property (the symmetric twin of the ADC test):
    // table-sum == ⟨decode(a), decode(b)⟩ for every code pair
    val tbl = spark.sparkContext.broadcast(Pq.sdcTable(cb, dim, m, ksub))
    val a = enc.filter(col("id") < 8)
      .select(col("id").as("id_a"), col("codes").as("ca"))
    val b = enc.filter(col("id") >= 8 && col("id") < 24)
      .select(col("id").as("id_b"), col("codes").as("cb"))
    val got = a.crossJoin(b)
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.pqSdcScore(
          col("ca"), col("cb"), tbl, m, ksub).as("s"))
      .as[(Long, Long, Double)].collect()
    val dec = Pq.decode(enc, cb, dim, m, ksub)
      .select(col("id"), col("recon"))
    val exact = dec.as("x").crossJoin(dec.as("y"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        Similarity.dot(col("x.recon"), col("y.recon")).as("d"))
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, d) => ((x, y), d) }.toMap
    assert(got.nonEmpty)
    got.foreach { case (ia, ib, s) =>
      assert(math.abs(s - exact((ia, ib))) < 1e-9,
        s"SDC $s vs decoded-dot ${exact((ia, ib))} for ($ia,$ib)")
    }
  }

  test("ivfSdcPrerankTopK: generous preRankC reproduces ivfTopK byte-for-byte") {
    // with a shortlist wider than any per-query candidate set the
    // pre-rank cannot drop anything, so the exact re-rank must emit
    // EXACTLY ivfTopK's rows — same scores (round 6), same tie order
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val q = corpus.filter(col("id") < 20)
    val exact = Similarity.ivfTopK(assigned, cents, q, "v", "id",
      k = 10, nProbe = 2)
    val pre = Pq.ivfSdcPrerankTopK(assigned, cents, cb, q, "v", "id",
      k = 10, nProbe = 2, preRankC = 200, dim = dim, m = m, ksub = ksub)
    assert(pre.orderBy("query_id", "rank").collect().toSeq ===
      exact.orderBy("query_id", "rank").collect().toSeq)
  }

  test("ivfSdcPrerankTopK: tight shortlist keeps recall@10 ≥ 0.9 vs exact-scored IVF") {
    // preRankC = 3×k — the same shortlist-to-k ratio the ADC tests use
    // on this all-near-ties fixture (raw PQ top-10 here is tie-break
    // noise by construction; what the pipeline needs is the true
    // neighbors REACHING the shortlist)
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val q = corpus.filter(col("id") < 20)
    val exact = Similarity.ivfTopK(assigned, cents, q, "v", "id",
      k = 10, nProbe = 2)
    val pre = Pq.ivfSdcPrerankTopK(assigned, cents, cb, q, "v", "id",
      k = 10, nProbe = 2, preRankC = 30, dim = dim, m = m, ksub = ksub)
    val recall = Similarity.recallAtK(pre, exact)
      .agg(avg("recall")).as[Double].first()
    assert(recall >= 0.9, s"pre-ranked recall@10 $recall vs exact IVF")
  }

  test("writePqIndex store: byte-identical to in-memory prerank, partition-pruned scan") {
    // the production shape: codes + cnorm persist WITH the
    // cell-partitioned index, codebooks under _codebooks/ — query time
    // reads the m-byte codes instead of re-encoding the corpus, and the
    // probed-cell predicate prunes the store scan
    val store = java.nio.file.Files.createTempDirectory("graft-pqidx").toString + "/index"
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    Pq.writePqIndex(assigned, cents, cb, store, dim = dim, m = m, ksub = ksub)
    val q = corpus.filter(col("id") < 20)
    val inMem = Pq.ivfSdcPrerankTopK(assigned, cents, cb, q, "v", "id",
      k = 10, nProbe = 2, preRankC = 30, dim = dim, m = m, ksub = ksub)
    val fromStore = Pq.ivfSdcPrerankTopKFromStore(spark, store, cents, q,
      "v", "id", k = 10, nProbe = 2, preRankC = 30, dim = dim, m = m, ksub = ksub)
    assert(fromStore.orderBy("query_id", "rank").collect() ===
      inMem.orderBy("query_id", "rank").collect())
    // the self-describing overload (shape + centroids from the store)
    // must agree with the explicit form
    val selfDesc = Pq.ivfSdcPrerankTopKFromStore(spark, store, q,
      "v", "id", k = 10, nProbe = 2, preRankC = 30)
    assert(selfDesc.orderBy("query_id", "rank").collect() ===
      inMem.orderBy("query_id", "rank").collect())
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"store scan is not partition-pruned:\n$plan")
    // the stored codes ARE the index: reading the store back and
    // re-deriving nothing must reproduce the persisted columns
    val back = spark.read.parquet(store)
    assert(back.columns.toSet === Set("corpus_id", "cv", "codes", "cnorm", "cell"))
    // the store self-describes its encode shape: a reader supplying a
    // mismatched (dim, m, ksub) must fail loudly BEFORE any scan, not
    // as an opaque out-of-bounds in the codebook flatten
    val err = intercept[IllegalArgumentException] {
      Pq.ivfSdcPrerankTopKFromStore(spark, store, cents, q,
        "v", "id", k = 10, nProbe = 2, preRankC = 30,
        dim = dim, m = m * 2, ksub = ksub)
    }
    assert(err.getMessage.contains("was written with"))
  }

  test("appendToPqIndex: incremental build == one-shot build, byte-identical") {
    // the daily-ingest shape: half the corpus at build time, half
    // appended later with the STORE'S persisted codebooks — a query
    // must not be able to tell the difference from a one-shot build
    val base = java.nio.file.Files.createTempDirectory("graft-pqappend").toString
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val oneShot = s"$base/oneshot"
    Pq.writePqIndex(assigned, cents, cb, oneShot, dim = dim, m = m, ksub = ksub)
    val incr = s"$base/incr"
    Pq.writePqIndex(assigned.filter(col("corpus_id") < 100), cents, cb, incr,
      dim = dim, m = m, ksub = ksub)
    // the append takes the RAW batch — assignment runs inside against
    // the STORE'S persisted centroids, so a caller cannot file rows
    // under cells probes don't expect
    Pq.appendToPqIndex(spark, incr, corpus.filter(col("id") >= 100), "v", "id")
    // re-ingesting the same batch with skipExistingIds must be a no-op
    Pq.appendToPqIndex(spark, incr, corpus.filter(col("id") >= 100), "v", "id",
      skipExistingIds = true)
    val q = corpus.filter(col("id") < 20)
    def run(p: String) = Pq.ivfSdcPrerankTopKFromStore(spark, p, cents, q,
        "v", "id", k = 10, nProbe = 2, preRankC = 30,
        dim = dim, m = m, ksub = ksub)
      .orderBy("query_id", "rank").collect()
    assert(run(incr) === run(oneShot))
  }

  test("streaming append crash-recovery: retry after a PARTIAL store commit still equals one-shot") {
    // q_stream_pq_append proves clean-run equivalence; the real risk is
    // a micro-batch retry AFTER part of the batch's parquet files
    // already landed in the store. Construct exactly that: run 1's
    // foreachBatch appends only HALF of batch 0's rows and then dies
    // (the checkpoint never commits the batch); run 2 resumes from the
    // SAME checkpoint with the real consumer. The offset log replays
    // batch 0 in full and skipExistingIds absorbs the half-committed
    // rows — the recovered store must be row-identical to a one-shot
    // build, and a store-backed query must not be able to tell.
    val base = java.nio.file.Files.createTempDirectory("graft-pqcrash").toString
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val oneShot = s"$base/oneshot"
    Pq.writePqIndex(assigned, cents, cb, oneShot, dim = dim, m = m, ksub = ksub)
    val incr = s"$base/incr"
    Pq.writePqIndex(assigned.filter(col("corpus_id") < 100), cents, cb, incr,
      dim = dim, m = m, ksub = ksub)
    // two file drops so recovery also proves later batches still run
    corpus.filter(col("id") >= 100 && col("id") < 150).coalesce(1)
      .write.parquet(s"$base/in")
    corpus.filter(col("id") >= 150).coalesce(1)
      .write.mode("append").parquet(s"$base/in")
    val ckpt = s"$base/ckpt"
    def stream(consumer: (org.apache.spark.sql.DataFrame, Long) => Unit) =
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(consumer)
        .start()
    // run 1: partial commit, then crash BEFORE the batch commits
    val crashed = stream { (batch, _) =>
      Pq.appendToPqIndex(batch.sparkSession, incr,
        batch.filter(col("id") % 2 === 0), "v", "id", skipExistingIds = true)
      throw new RuntimeException("simulated crash after partial store commit")
    }
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    assert(err.toString.contains("simulated crash"), s"wrong failure: $err")
    // the half-committed rows ARE in the store, the checkpoint is not
    val committed = spark.read.parquet(incr).count()
    assert(committed > 100 && committed < 200,
      s"fixture must leave a genuine partial commit, store has $committed rows")
    // run 2: same checkpoint, the real consumer — recovery
    stream { (batch, _) =>
      Pq.appendToPqIndex(batch.sparkSession, incr, batch, "v", "id",
        skipExistingIds = true)
    }.awaitTermination()
    val cols = Seq("corpus_id", "cell", "codes", "cnorm").map(col)
    val a = spark.read.parquet(incr).select(cols: _*)
    val b = spark.read.parquet(oneShot).select(cols: _*)
    assert(a.exceptAll(b).count() + b.exceptAll(a).count() === 0,
      "recovered store must be row-identical to the one-shot build")
    val q = corpus.filter(col("id") < 20)
    def run(p: String) = Pq.ivfSdcPrerankTopKFromStore(spark, p, cents, q,
        "v", "id", k = 10, nProbe = 2, preRankC = 30,
        dim = dim, m = m, ksub = ksub)
      .orderBy("query_id", "rank").collect()
    assert(run(incr) === run(oneShot))
  }

  test("appendToPqIndex: strict id check catches moved-cell re-ingest; schema mismatch fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-pqstrict").toString
    val cents = Similarity.refineCentroids(corpus,
      Similarity.coarseCentroids(corpus, "v", "id", nCells = 8),
      "v", "id", iterations = 1)
    val assigned = Similarity.assignCells(corpus, cents, "v", "id")
    val store = s"$base/store"
    Pq.writePqIndex(assigned, cents, cb, store, dim = dim, m = m, ksub = ksub)
    val n0 = spark.read.parquet(store).count()
    // a re-ingested id whose vector CHANGED assigns to a different
    // cell — the cell-pruned skipExistingIds check never reads the
    // id's original cell, so only strict mode can catch it. Build the
    // scenario from the actual assignment so it can't degenerate:
    // id 150 re-arrives wearing the vector of a row in another cell.
    val cellOf = assigned.select("corpus_id", "cell")
      .as[(Long, Long)].collect().toMap
    val srcId = cellOf.keys.find(i => cellOf(i) != cellOf(150L)).get
    val movedVec = corpus.filter(col("id") === srcId)
      .select("v").as[Seq[Float]].head()
    val moved = Seq((150L, movedVec)).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    Pq.appendToPqIndex(spark, store, moved, "v", "id", strictIdCheck = true)
    assert(spark.read.parquet(store).count() === n0,
      "strict append of an existing id must be a no-op")
    // the pruned check passes the same row (its new cell has no id
    // 150) — the documented hole strict mode exists for
    Pq.appendToPqIndex(spark, store, moved, "v", "id", skipExistingIds = true)
    assert(spark.read.parquet(store).count() === n0 + 1)
    // a mistyped batch must fail BEFORE writing (a committed mixed-
    // schema file would only blow up at the next read of the index)
    val bad = corpus.filter(col("id") === 0)
      .select((col("id") + 10000).as("id"),
        col("v").cast("array<double>").as("v"))
    val err = intercept[IllegalArgumentException] {
      Pq.appendToPqIndex(spark, store, bad, "v", "id")
    }
    assert(err.getMessage.contains("would corrupt the index"))
  }
}
