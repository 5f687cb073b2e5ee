package graft.tools

/** Scale soak harness (not part of the driver contract): synthesizes a
  * 510k-doc corpus with seeded near-dups and a 10M-row date-partitioned
  * fact table under /tmp/soak, then drives dedup + partitioned upsert
  * at that scale. Run: `sbt "runMain graft.tools.Soak"`.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    // optional section filter: docs | fact | embs | boiler (default all)
    val sections =
      if (args.isEmpty) Set("docs", "fact", "load", "embs", "boiler", "r4", "r5", "r5b", "r5c", "r5d", "r6", "r6b", "r6c", "r7", "r7b") else args.toSet
    def section(name: String)(body: => Unit): Unit =
      if (sections.contains(name)) body
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "24g")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val base = "/tmp/soak"

    // 500k synthetic docs: 60-word texts from a 50-word vocab, 2% near-dup pairs
    val vocab = (0 until 50).map(i => s"w$i")
    def genDocs() = time("gen 500k docs") {
      val df = spark.range(500000).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          element_at(typedLit(vocab), (pmod(xxhash64(col("id"), lit(j)), lit(50)) + 1).cast("int"))): _*).as("text"))
      val dups = df.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" w0")).as("text")) // near-dup with one extra token
      val out = df.unionByName(dups)
      out.write.mode("overwrite").parquet(s"$base/docs"); spark.read.parquet(s"$base/docs")
    }
    section("docs") {
      val docs = genDocs()
      println("[soak] corpus size: " + docs.count())
      time("exact dedup")(graft.ext.Dedup.exact(docs, "text", "doc_id").count())
      val nd = time("minhash LSH near-dups")(
        graft.ext.Dedup.minhashNearDups(docs, "text", "doc_id", shingleSize = 3, k = 64, bands = 16, threshold = 0.6).count())
      println("[soak] minhash pairs found: " + nd)
      val sh = time("simhash near-dups")(
        graft.ext.Dedup.simhashNearDups(docs, "text", "doc_id", shingleSize = 3, maxHamming = 6, prefixBits = 10).count())
      println("[soak] simhash pairs found: " + sh)
    }

    // 10M-row fact table partitioned by 100 dates; upsert a 2-date batch
    section("fact") {
    time("gen 10M fact") {
      spark.range(10000000).select(col("id"),
          date_format(date_add(lit("2024-01-01").cast("date"), pmod(col("id"), lit(100)).cast("int")), "yyyy-MM-dd").as("day"),
          (col("id") % 1000).cast("double").as("v"))
        .write.mode("overwrite").partitionBy("day").parquet(s"$base/fact")
    }
    val batch = spark.range(50000).select((col("id") * 7).as("id"),
        lit("2024-01-05").as("day"), lit(-1.0).as("v"))
      .unionByName(spark.range(1000).select((col("id") + 20000000).as("id"), lit("2024-01-07").as("day"), lit(-2.0).as("v")))
    val dirsBefore = new java.io.File(s"$base/fact").listFiles.filter(_.isDirectory)
      .map(d => d.getName -> d.lastModified).toMap
    time("partitioned upsert (2 of 100 partitions)") {
      graft.ops.Upsert.upsertPartitioned(spark, s"$base/fact", batch, Seq("id"), "day")
    }
    val touched = new java.io.File(s"$base/fact").listFiles.filter(_.isDirectory)
      .filter(d => d.lastModified != dirsBefore.getOrElse(d.getName, 0L)).map(_.getName).sorted
    println("[soak] partitions rewritten: " + touched.mkString(", "))
    println("[soak] fact count after: " + spark.read.parquet(s"$base/fact").count())
    }

    // round 2: the ORCHESTRATOR's crash-safe staged-swap load at scale —
    // 10M-row sessions fact over 100 dates, then a 2-date incremental
    // batch: must rewrite exactly 2 partitions, per-partition renames
    // included in the timing
    section("load") {
      val wh = s"$base/wh"
      new java.io.File(s"$wh/sessions").delete()
      val pipe = new graft.pipeline.EtlPipeline(spark, wh)
      val full = spark.range(10000000).select(
        concat(lit("s"), col("id")).as("id"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"),
          pmod(col("id"), lit(100)).cast("int"))).as("start_dt"),
        (col("id") % 1000).cast("double").as("average_score"))
      time("initial 10M-row sessions load (100 date partitions)") {
        pipe.loadTable("sessions", full)
      }
      // batch keys stay in their original date partition (id ≡ 4 mod
      // 100 → 2024-01-05), honoring the stable-partition contract
      val batch = spark.range(50000).select(
        concat(lit("s"), col("id") * 100 + 4).as("id"),
        lit("2024-01-05 00:00:00").cast("timestamp").as("start_dt"),
        lit(-1.0).as("average_score"))
      val dirs = new java.io.File(s"$wh/sessions").listFiles.filter(_.isDirectory)
        .map(d => d.getName -> d.lastModified).toMap
      time("incremental 50k-row batch via staged per-partition swap") {
        pipe.loadTable("sessions", batch)
      }
      val touchedP = new java.io.File(s"$wh/sessions").listFiles.filter(_.isDirectory)
        .filter(d => d.lastModified != dirs.getOrElse(d.getName, 0L)).map(_.getName).sorted
      println("[soak] sessions partitions rewritten: " + touchedP.mkString(", "))
      println("[soak] sessions count after: " +
        spark.read.parquet(s"$wh/sessions").count())
    }

    // round 2: embedding near-dup at a scale where all-pairs is
    // impossible (200k × 200k / 2 = 2·10¹⁰ cosine pairs) — the bucketed
    // path must finish AND find the seeded near-identical pairs
    section("embs") {
    val embs = time("gen 200k 32-d embeddings (+2k planted near-dups)") {
      val dim = 32
      // deterministic pseudo-gaussian-ish coords from hash buckets,
      // clustered: 64 cluster centers, points = center + small jitter
      def coord(j: Int, of: org.apache.spark.sql.Column, scale: Double, offset: org.apache.spark.sql.Column) =
        (pmod(xxhash64(of, lit(j)), lit(1000)).cast("double") / 500.0 - 1.0) * scale + offset
      val centersOf = pmod(col("id"), lit(64)) // cluster id
      val df = spark.range(200000).select(col("id").as("vec_id"),
        array((0 until dim).map(j =>
          (coord(j, centersOf, 5.0, lit(0.0)) + coord(j, col("id"), 1.2, lit(0.0)))
            .cast("float")): _*).as("embedding"))
      val dups = df.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + 10000000).as("vec_id"),
          transform(col("embedding"), x => (x + lit(0.001f)).cast("float")).as("embedding"))
      val out = df.unionByName(dups)
      out.write.mode("overwrite").parquet(s"$base/embs"); spark.read.parquet(s"$base/embs")
    }
    println("[soak] embeddings: " + embs.count())
    val pairs = time("bucketed embedding near-dups (nCells=256, nProbe=2)") {
      graft.ext.Dedup.embeddingNearDupsBucketed(embs, "embedding", "vec_id",
        threshold = 0.9999, nCells = 256, nProbe = 2, lloydIterations = 1)
        .cache()
    }
    // the builder block above is LAZY apart from the centroid collect —
    // the pair join + exact verify run inside this timed count
    val nPairs = time("exact-verify pair scan (count)") { pairs.count() }
    val planted = pairs.filter(col("id_b") >= 10000000 && col("id_a") === col("id_b") - 10000000).count()
    println(s"[soak] near-dup pairs: $nPairs; planted pairs recovered: $planted / 2000")
    // paired r14 measurement: the SAME budgets with the PQ-SDC
    // pre-filter in front of the exact verify — the cut is the exact
    // cosine work skipped on pairs the quantized score rules out
    val pairsPq = time("bucketed embedding near-dups + PQ-SDC pre-filter (margin=0.3)") {
      graft.ext.Dedup.embeddingNearDupsBucketedPq(embs, "embedding", "vec_id",
        threshold = 0.9999, nCells = 256, nProbe = 2, lloydIterations = 1,
        margin = 0.3, m = 16, ksub = 16)
        .cache()
    }
    val nPairsPq = time("pq-prefiltered pair scan (count)") { pairsPq.count() }
    val plantedPq = pairsPq.filter(col("id_b") >= 10000000 && col("id_a") === col("id_b") - 10000000).count()
    println(s"[soak] pq-prefiltered near-dup pairs: $nPairsPq; planted recovered: $plantedPq / 2000")
    }

    // round 2: LSH hot-bucket cap under a boilerplate block — 20k
    // IDENTICAL docs would alone contribute 2·10⁸ candidate pairs per
    // band uncapped; the capped run must stay fast and keep the real
    // near-dup pairs
    section("boiler") {
    val docsOnDisk =
      if (new java.io.File(s"$base/docs").exists()) spark.read.parquet(s"$base/docs")
      else genDocs()
    val boiler = time("gen 510k docs + 20k identical boilerplate") {
      val b = spark.range(20000).select((col("id") + 2000000).as("doc_id"),
        lit((0 until 60).map(i => s"b${i % 7}").mkString(" ")).as("text"))
      docsOnDisk.unionByName(b).write.mode("overwrite").parquet(s"$base/docs_boiler")
      spark.read.parquet(s"$base/docs_boiler")
    }
    val capped = time("minhash LSH with maxBucketSize=1000 (boilerplate-capped)") {
      graft.ext.Dedup.minhashNearDups(boiler, "text", "doc_id",
        shingleSize = 3, k = 64, bands = 16, threshold = 0.6,
        maxBucketSize = Some(1000)).count()
    }
    println(s"[soak] capped pairs (boilerplate block excluded): $capped — the clean corpus' seeded 10,000")
    }
    // round 4: cluster resolution, incremental dedup, and BM25 at scale
    section("r4") {
      // connected components: 1M nodes in 200k chains of 5 (diameter 4
      // forces multiple propagation rounds) — must resolve every chain
      // to its minimum and leave sizes exactly 5
      val nodes = spark.range(1000000).toDF("id")
      val edges = spark.range(1000000).filter(col("id") % 5 =!= 4)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val cc = time("connected components: 1M nodes, 800k edges, diameter 4") {
        graft.ext.Dedup.connectedComponents(edges, nodes).cache()
      }
      val nClusters = cc.select(countDistinct(col("cluster_id"))).as[Long].head()
      val maxSize = cc.groupBy(col("cluster_id")).count()
        .agg(max(col("count"))).as[Long].head()
      val wrong = cc.filter(col("cluster_id") =!= col("id") - pmod(col("id"), lit(5))).count()
      println(s"[soak] cc clusters: $nClusters (expect 200000), max size: $maxSize (expect 5), mislabeled: $wrong (expect 0)")

      // incremental near-dedup: 10k-doc batch against the 510k store —
      // half the batch are near-dups of store docs (one extra token)
      val store =
        if (new java.io.File(s"$base/docs").exists()) spark.read.parquet(s"$base/docs")
        else genDocs()
      val incoming = store.filter(col("doc_id") % 100 === 1).limit(5000)
        .select((col("doc_id") + 5000000).as("doc_id"),
          concat(col("text"), lit(" w1")).as("text"))
        .unionByName(spark.range(5000).select((col("id") + 6000000).as("doc_id"),
          concat_ws(" ", (0 until 60).map(j =>
            concat(lit("z"), pmod(xxhash64(col("id"), lit(j)), lit(50)))): _*).as("text")))
      // production flow: the store's banded signatures are persisted
      // ONCE (and appended per accepted batch); each arriving batch
      // only signs itself and joins
      time("one-time: persist 510k-doc banded signature store") {
        graft.ext.Dedup.bandedSignatures(store, "text", "doc_id",
            shingleSize = 3, k = 64, bands = 16)
          .write.mode("overwrite").parquet(s"$base/sigstore")
      }
      val incPairs = graft.ext.Dedup.minhashNearDupsAgainstBanded(
        graft.ext.Dedup.bandedSignatures(incoming, "text", "doc_id",
          shingleSize = 3, k = 64, bands = 16),
        spark.read.parquet(s"$base/sigstore"),
        k = 64, threshold = 0.6).cache()
      val nInc = time("per-batch: 10k batch vs persisted 510k store") {
        incPairs.count()
      }
      val matchedNew = incPairs.select(countDistinct(col("id_new"))).as[Long].head()
      println(s"[soak] incremental pairs: $nInc; distinct incoming docs flagged: $matchedNew (expect ~5000, none from the fresh 5k)")

      // BM25 over the 510k-doc corpus: full scoring + top-20
      val hits = time("bm25 top-20 over 510k docs (3 query terms)") {
        graft.ext.Search.bm25(store, "text", "doc_id", Seq("w1", "w2", "w3"), topK = 20)
          .collect()
      }
      println(s"[soak] bm25 returned ${hits.length} ranked docs; top score ${hits.headOption.map(_.getDouble(1)).getOrElse(0.0)}")
    }
    section("r5") {
      // z-order layout vs single-column sort, judged the way engines
      // actually skip data: parquet footer min/max stats per row group.
      // A row group is PRUNABLE for a predicate iff its [min,max] range
      // doesn't intersect the predicate — we read the written footers
      // and count, deterministically (no timing noise).
      val n = 10000000L
      val fact = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(4096)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(4096)).as("y"),
        col("id").as("payload"))
      time("write 10M rows z-ordered (64 files)") {
        graft.ops.Layout.zorderBy(fact, col("x"), col("y"), 64, bits = 12)
          .write.mode("overwrite").parquet(s"$base/zfact")
      }
      time("write 10M rows x-sorted (64 files)") {
        fact.repartitionByRange(64, col("x"), col("y"))
          .sortWithinPartitions(col("x"), col("y"))
          .write.mode("overwrite").parquet(s"$base/xfact")
      }
      val hconf = spark.sessionState.newHadoopConf()
      def rowGroupRanges(dir: String): Seq[Map[String, (Long, Long)]] =
        new java.io.File(dir).listFiles().toSeq
          .filter(f => f.getName.endsWith(".parquet")).flatMap { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new org.apache.hadoop.fs.Path(f.getPath), hconf)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              import scala.jdk.CollectionConverters._
              reader.getFooter.getBlocks.asScala.toSeq.map { block =>
                block.getColumns.asScala
                  .filter(c => Set("x", "y").contains(c.getPath.toDotString))
                  .map { c =>
                    val st = c.getStatistics
                    c.getPath.toDotString ->
                      (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                        st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                  }.toMap
              }
            } finally reader.close()
          }
      def prunable(ranges: Seq[Map[String, (Long, Long)]],
                   pred: Map[String, (Long, Long)]): Int =
        ranges.count { rg =>
          pred.exists { case (c, (lo, hi)) =>
            rg.get(c).exists { case (mn, mx) => mx < lo || mn > hi }
          }
        }
      val stripe = (1024L, 1151L) // 128 of 4096 values = 1/32 of the domain
      for ((label, dir) <- Seq("z-ordered" -> s"$base/zfact", "x-sorted" -> s"$base/xfact")) {
        val ranges = rowGroupRanges(dir)
        val total = ranges.size
        val px = prunable(ranges, Map("x" -> stripe))
        val py = prunable(ranges, Map("y" -> stripe))
        val pbox = prunable(ranges, Map("x" -> stripe, "y" -> stripe))
        println(s"[soak] $label layout: $total row groups; prunable for " +
          s"x-stripe $px, y-stripe $py, box $pbox")
      }
      // correctness: both layouts return identical filtered counts
      val zc = spark.read.parquet(s"$base/zfact")
        .filter(col("x").between(stripe._1, stripe._2)).count()
      val xc = spark.read.parquet(s"$base/xfact")
        .filter(col("x").between(stripe._1, stripe._2)).count()
      println(s"[soak] x-stripe counts agree: z=$zc sorted=$xc (${zc == xc})")

      // round-5 text ops at 510k-doc scale: the duplicate-passage
      // profile must flag the seeded near-dups (they share all but one
      // window with their source doc) and the Gopher filter is a pure
      // narrow map — both must hold throughput at corpus scale
      val store =
        if (new java.io.File(s"$base/docs").exists()) spark.read.parquet(s"$base/docs")
        else genDocs()
      val dp = time("duplicate-passage profile over 510k docs (5-gram windows)") {
        val out = graft.ext.Dedup.duplicatePassages(store, "text", "doc_id", n = 5).cache()
        out.count() // force — cache() alone is lazy and would time nothing
        out
      }
      val planted = dp.filter(col("id") >= 1000000 && col("dup_frac") > 0.8).count()
      println(s"[soak] planted near-dups with dup_frac > 0.8: $planted / 10000")
      dp.unpersist()
      val gf = time("Gopher filter over 510k docs") {
        graft.ext.TextOps.gopherFilter(store, "text", "doc_id")
          .agg(sum(when(col("passes"), 1L).otherwise(0L))).head().getLong(0)
      }
      println(s"[soak] gopher-passing docs: $gf")
      val kt = time("TF-IDF key terms over 510k docs (top-3)") {
        graft.ext.Search.keyTerms(store, "text", "doc_id", topK = 3).count()
      }
      println(s"[soak] keyterm rows: $kt")
      // passage REMOVAL: the planted near-dups (60 shared tokens + one
      // extra) must be stripped to nearly nothing while unique docs
      // keep their text
      val removed = time("duplicate-passage removal over 510k docs") {
        val out = graft.ext.Dedup.removeDuplicatePassages(store, "text", "doc_id", n = 5).cache()
        out.count()
        out
      }
      val strippedPlanted = removed.filter(col("id") >= 1000000 && col("n_kept_tokens") < 10).count()
      println(s"[soak] planted near-dups stripped below 10 tokens: $strippedPlanted / 10000")
      removed.unpersist()
    }

    // round 5b: PQ at 202k embeddings, compaction, priority sampling,
    // SCD2 changelog rebuild and funnel at 10M events
    section("r5b") {
      require(new java.io.File(s"$base/embs").exists(),
        "[soak] r5b needs the embs section to have run first")
      val embs = spark.read.parquet(s"$base/embs")
      val e = embs.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val (dim, m, ksub) = (32, 8, 16)
      val cb = time("PQ train 8×16 codebooks over 202k 32-d embeddings (2 Lloyd iters)") {
        graft.ext.Pq.trainCodebooks(e, "v", "id", dim, m, ksub, iterations = 2)
      }
      val encPath = s"$base/pq_codes"
      time("PQ encode 202k vectors → byte codes (persisted)") {
        graft.ext.Pq.encode(e, cb, "v", "id", dim, m, ksub)
          .write.mode("overwrite").parquet(encPath)
      }
      val enc = spark.read.parquet(encPath)
      val queries = e.filter(col("id") % 40000 === 7).limit(5)
      val reranked = time("PQ ADC shortlist-200 + exact re-rank top-10, 5 queries") {
        graft.ext.Pq.adcRerankTopK(enc, cb, queries, e, "v", "id",
          k = 10, shortlistK = 200, dim, m, ksub).cache()
      }
      reranked.count()
      val exact = time("exact brute-force top-10 (baseline for recall)") {
        graft.ext.Similarity.bruteForceTopK(e, queries, "v", "id", k = 10).cache()
      }
      exact.count()
      val recall = graft.ext.Similarity.recallAtK(reranked, exact)
        .agg(avg("recall")).as[Double].head()
      println(f"[soak] PQ re-ranked recall@10 over 202k: $recall%.3f (32-dim clustered, 32× code compression)")
      reranked.unpersist()

      // IVF-PQ: residual codes — same m bytes per vector, local
      // resolution restored (plain PQ's error is sized by the global
      // spread; inside a 3k-member cluster every row is an ADC
      // near-tie and recall collapses to the tie-break lottery above)
      val cents = time("IVF-PQ coarse quantizer: 256 cells + 1 Lloyd iter") {
        graft.ext.Similarity.refineCentroids(e,
          graft.ext.Similarity.coarseCentroids(e, "v", "id", nCells = 256),
          "v", "id", iterations = 1)
      }
      val (rcb, ivfEnc) = {
        val t0 = System.nanoTime()
        val r = graft.ext.Pq.ivfPqIndex(e, cents, "v", "id", dim, m, ksub,
          iterations = 2)
        r._2.write.mode("overwrite").partitionBy("cell").parquet(s"$base/ivfpq")
        println(f"[soak] IVF-PQ index 202k (train residual codebooks + encode + persist by cell): ${(System.nanoTime() - t0) / 1e9}%.1fs")
        (r._1, spark.read.parquet(s"$base/ivfpq"))
      }
      val ivfReranked = time("IVF-PQ probe-8 + ADC shortlist-200 + exact re-rank, 5 queries") {
        graft.ext.Pq.ivfPqRerankTopK(ivfEnc, cents, rcb, queries, e, "v", "id",
          k = 10, shortlistK = 200, nProbe = 8, dim = dim, m = m, ksub = ksub).cache()
      }
      ivfReranked.count()
      val ivfRecall = graft.ext.Similarity.recallAtK(ivfReranked, exact)
        .agg(avg("recall")).as[Double].head()
      println(f"[soak] IVF-PQ re-ranked recall@10 over 202k: $ivfRecall%.3f (vs $recall%.3f plain-PQ)")
      ivfReranked.unpersist()
      // tie-heavy corpora (3.2k-member clusters) put the top-10
      // distinction below ANY 8-byte quantizer's floor — the knob is a
      // shortlist ≥ the ambiguity set; the index's value is that the
      // probed candidate pool (~3%) makes that shortlist cheap
      val ivfWide = time("IVF-PQ probe-8 + shortlist-4000 + exact re-rank, 5 queries") {
        graft.ext.Pq.ivfPqRerankTopK(ivfEnc, cents, rcb, queries, e, "v", "id",
          k = 10, shortlistK = 4000, nProbe = 8, dim = dim, m = m, ksub = ksub).cache()
      }
      ivfWide.count()
      val ivfWideRecall = graft.ext.Similarity.recallAtK(ivfWide, exact)
        .agg(avg("recall")).as[Double].head()
      println(f"[soak] IVF-PQ re-ranked recall@10, shortlist 4000: $ivfWideRecall%.3f (fetches 4000 of 202k full vectors/query)")
      ivfWide.unpersist(); exact.unpersist()

      // compaction: the 510k-doc corpus fragmented into 512 files →
      // bin-packed to 128 MB targets; content must checksum-match
      val store =
        if (new java.io.File(s"$base/docs").exists()) spark.read.parquet(s"$base/docs")
        else genDocs()
      time("fragment 510k docs into 512 files") {
        store.repartition(512).write.mode("overwrite").parquet(s"$base/docs_frag")
      }
      val before = spark.read.parquet(s"$base/docs_frag")
        .agg(count(lit(1)), sum(pmod(graft.functions.VectorExpressions.fnv1a64(col("text")), lit(1000000L))))
        .as[(Long, Long)].head()
      val rep = time("compact 512 → 128 MB-target files (narrow coalesce + swap)") {
        graft.ops.Layout.compact(spark, s"$base/docs_frag", targetBytes = 128L * 1024 * 1024)
      }
      val after = spark.read.parquet(s"$base/docs_frag")
        .agg(count(lit(1)), sum(pmod(graft.functions.VectorExpressions.fnv1a64(col("text")), lit(1000000L))))
        .as[(Long, Long)].head()
      println(s"[soak] compaction ${rep.filesBefore} files (${rep.bytesBefore >> 20} MB) → " +
        s"${rep.filesAfter} files; content preserved: ${before == after}")

      val sampled = time("priority sample 10k of 510k by char weight") {
        graft.ext.Corpus.prioritySample(store, "doc_id", length(col("text")), k = 10000).count()
      }
      println(s"[soak] priority sample rows: $sampled")

      // 10M-event stream: SCD2 changelog rebuild + strict funnel
      val ev = spark.range(10000000).select(
        (col("id") % 500000).as("user_id"),
        element_at(typedLit(Seq("view", "click", "purchase", "error")),
          (pmod(xxhash64(col("id")), lit(4)) + 1).cast("int")).as("event_type"),
        (to_timestamp(lit("2024-01-01 00:00:00"))
          + expr("make_interval(0, 0, 0, 0, 0, 0, id % 2592000)")).as("ts"),
        col("id").as("event_id"))
      val hist = time("SCD2 rebuild from 10M-event changelog (500k keys)") {
        graft.ops.Scd2.fromChangelog(ev, Seq("user_id"), Seq("event_type"),
          "ts", "event_id").count()
      }
      println(s"[soak] scd2 intervals: $hist")
      val fun = time("strict 3-step funnel over 10M events (500k users)") {
        graft.ext.Behavior.funnelCounts(
          graft.ext.Behavior.funnelUsers(ev, "user_id", "ts", "event_type",
            Seq("view", "click", "purchase")), Seq("view", "click", "purchase"))
          .collect()
      }
      fun.foreach(r => println(s"[soak] funnel ${r.mkString(" | ")}"))
    }

    // round-5 additions: edit-distance linkage, heavy hitters, native as-of
    section("r5c") {
      // 300k-entity master list with enough name entropy that PassJoin
      // segments block meaningfully; 10k dirty probes with one seeded
      // char deletion each — every probe must re-link to its source
      val wa = (0 until 200).map(i => s"alpha$i")
      val wb = (0 until 200).map(i => s"beta$i")
      val master = spark.range(300000).select(col("id").as("mid"),
        concat_ws("-",
          element_at(typedLit(wa), (pmod(xxhash64(col("id"), lit(1)), lit(200)) + 1).cast("int")),
          element_at(typedLit(wb), (pmod(xxhash64(col("id"), lit(2)), lit(200)) + 1).cast("int")),
          col("id").cast("string")).as("mname"))
      val pos = (pmod(col("mid"), lit(6)) + 2).cast("int")
      val dirty = master.filter(col("mid") % 30 === 0)
        .select(col("mid").as("did"),
          concat(col("mname").substr(lit(1), pos),
            col("mname").substr(pos + lit(2), length(col("mname")))).as("dname"))
      val linked = time("edit-distance join: 10k dirty probes vs 300k master, k=1") {
        graft.ext.Linkage.editDistanceJoin(dirty, master, "dname", "mname", k = 1)
          .cache()
      }
      val nPairs = linked.count()
      val selfLinked = linked.filter(col("did") === col("mid")).count()
      println(s"[soak] linkage pairs: $nPairs; probes re-linked to source: " +
        s"$selfLinked/10000 (others are genuine distance-1 neighbors)")
      linked.unpersist()

      // heavy hitters: 10M rows, 4 hot keys over a 1M-key tail;
      // capacity 256 — sketch vs exact groupBy topk
      val hh = spark.range(10000000).select(
        when(pmod(xxhash64(col("id")), lit(10)) < 4,
          concat(lit("hot"), pmod(xxhash64(col("id"), lit(7)), lit(4))))
          .otherwise(concat(lit("tail"), pmod(xxhash64(col("id"), lit(9)), lit(1000000))))
          .as("k"))
      val sketchTop = time("space_saving_topk(256) over 10M rows (1M distinct keys)") {
        hh.agg(graft.functions.VectorExpressions.spaceSavingTopK(col("k"), 256).as("s"))
          .select(explode(col("s")).as("h")).select("h.key", "h.est", "h.err")
          .limit(10).collect()
      }
      val exactTop = time("exact groupBy count top-10 (baseline)") {
        hh.groupBy("k").count().orderBy(col("count").desc).limit(10).collect()
      }
      val sketchHot = sketchTop.map(_.getString(0)).filter(_.startsWith("hot")).toSet
      val exactHot = exactTop.map(_.getString(0)).filter(_.startsWith("hot")).toSet
      println(s"[soak] heavy hitters: sketch found $sketchHot == exact $exactHot: " +
        s"${sketchHot == exactHot}; top sketch rows: " +
        sketchTop.take(4).map(r => s"${r.getString(0)}=${r.getLong(1)}±${r.getLong(2)}").mkString(", "))

      // native as-of vs window composition: 10M trades, 1M quotes, 100k keys
      val trades = spark.range(10000000).select(
        pmod(col("id"), lit(100000)).as("k"),
        (col("id") * 7 % 1000000000L).as("lt"),
        col("id").as("lid"))
      val quotes = spark.range(1000000).select(
        pmod(col("id"), lit(100000)).as("k"),
        (col("id") * 61 % 1000000000L).as("qt"),
        (col("id") % 997).cast("double").as("px"))
        .groupBy("k", "qt").agg(max("px").as("px"))
      val viaWindow = time("as-of composition (union+window): 10M x 1M") {
        graft.ops.AsOfJoin.asofBackward(trades, quotes, "k", "lt", "qt", Seq("px"))
          .agg(count(lit(1)), sum(col("px").cast("decimal(18,2)"))).collect()
      }
      val viaNative = time("as-of native exec (merge join): 10M x 1M") {
        graft.ops.AsOfJoin.asofNative(trades, quotes, "k", "lt", "qt", Seq("px"))
          .agg(count(lit(1)), sum(col("px").cast("decimal(18,2)"))).collect()
      }
      println(s"[soak] as-of checksums equal: ${viaWindow.head == viaNative.head} " +
        s"(${viaWindow.head.mkString("|")})")
    }

    // round-5 additions II: rollup maintenance, snapshot diff, binning
    section("r5d") {
      // incremental rollup maintenance: 1M-key stored rollup + 100k-row batch
      val hist = spark.range(10000000).select(
        pmod(col("id"), lit(1000000)).as("k"),
        (col("id") % 100).as("v"))
      val batch = spark.range(100000).select(
        (pmod(col("id"), lit(50000)) * 17).as("k"),
        (col("id") % 100).as("v"))
      def agg1(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,2)")).as("v_sum"))
      val store = agg1(hist)
      store.write.mode("overwrite").parquet(s"$base/rollup_store")
      val stored = spark.read.parquet(s"$base/rollup_store")
      val maintained = time("maintainRollup: 1M-key store + 100k-row batch") {
        graft.sync.Incremental.maintainRollup(stored, agg1(batch),
          Seq("k"), Seq("n", "v_sum")).count()
      }
      val recomputed = time("full recompute baseline (10.1M raw rows)") {
        agg1(hist.unionByName(batch)).count()
      }
      println(s"[soak] rollup keys maintained=$maintained recomputed=$recomputed")

      // snapshot diff at 10M rows with 1% churn
      val vOld = spark.range(10000000).select(col("id").as("k"),
        (col("id") % 1000).as("v")).filter(col("k") % 101 =!= 0)
      val vNew = spark.range(10000000).select(col("id").as("k"),
        when(col("id") % 97 === 0, col("id") % 1000 + 1)
          .otherwise(col("id") % 1000).as("v")).filter(col("k") % 103 =!= 5)
      val d = time("snapshot diff: 10M rows, ~1% churn") {
        graft.ops.Snapshot.diffSummary(vOld, vNew, Seq("k")).collect()
      }
      println("[soak] diff summary: " + d.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" "))

      // quantile binning at 10M: edges once, assignment codegen'd
      val big = spark.range(10000000).select(col("id"),
        (pmod(xxhash64(col("id")), lit(100000)) / lit(7.0)).as("v"))
      val binned = time("quantileBins(10) over 10M rows") {
        graft.ops.Validate.quantileBins(big, "v", nBins = 10)
          .groupBy("bin").count().orderBy("bin").collect()
      }
      val sizes = binned.map(_.getLong(1))
      println(s"[soak] bin sizes min=${sizes.min} max=${sizes.max} " +
        s"(equal-frequency within ${(sizes.max - sizes.min) * 100.0 / 1000000}%)")
    }

    section("r6") {
      // --- pagerank at 10M edges / 1M nodes ---
      val edges = time("gen 10M edges") {
        val df = spark.range(10000000).select(
          pmod(xxhash64(col("id"), lit(1)), lit(1000000)).as("src"),
          pmod(xxhash64(col("id"), lit(2)), lit(1000000)).as("dst"))
        df.write.mode("overwrite").parquet(s"$base/edges")
        spark.read.parquet(s"$base/edges")
      }
      val pr = time("pagerank 3 iters, 10M edges (pinned)") {
        // at this depth×volume the pinned path wins: lazy would carry a
        // 10M-edge triple-reference lineage through 3 iterations
        graft.ext.Graph.pagerank(edges, "src", "dst", iterations = 3,
          checkpointEach = true)
      }
      val mass = pr.agg(sum("rank")).as[Double].head()
      println(f"[soak] pagerank mass=$mass%.6f over ${pr.count()} nodes (expect ~1.0)")

      // --- binned range join: 10M points vs 100k intervals ---
      val pts = time("gen 10M points") {
        spark.range(10000000).select(col("id").as("pid"),
          (pmod(xxhash64(col("id")), lit(1000000)) / lit(100.0)).as("p"))
      }
      val ivs = spark.range(100000).select(col("id").as("iid"),
        (pmod(xxhash64(col("id"), lit(9)), lit(990000)) / lit(100.0)).as("lo"))
        .withColumn("hi", col("lo") + lit(50.0))
      val nPairs = time("binnedPointJoin 10M x 100k (width 50, bin 50)") {
        graft.ops.Intervals.binnedPointJoin(pts, "p", ivs, "lo", "hi", binSize = 50.0)
          .count()
      }
      // each interval covers width 50 of a ~9900-unit space holding 10M
      // points → ~50.5k pairs/interval × 100k intervals ≈ 5.05e9
      println(s"[soak] binned join pairs: $nPairs (expect ~5.05e9)")

      // --- chunking 510k docs ---
      val docs =
        if (new java.io.File(s"$base/docs").exists()) spark.read.parquet(s"$base/docs")
        else genDocs()
      val nChunks = time("chunkTokens 510k docs (40 tok / 10 overlap)") {
        graft.ext.TextOps.chunkTokens(docs, "text", "doc_id", 40, 10).count()
      }
      println(s"[soak] chunks: $nChunks from ${docs.count()} docs (60-61 tokens → 2 each)")

      // --- AUC on 10M scored rows ---
      // raw score is 0..120-ish; auc enforces [0,1], so squash with the
      // monotone s/(s+100) (ranking — and so AUC up to tie merges —
      // unchanged)
      val rawScore = pmod(xxhash64(col("id"), lit(3)), lit(10000)) / lit(100.0) +
        when(pmod(xxhash64(col("id")), lit(100)) < 30, 20.0).otherwise(0.0)
      val scored = spark.range(10000000).select(
        (pmod(xxhash64(col("id")), lit(100)) < 30).as("y"),
        (rawScore / (rawScore + lit(100.0))).as("s"))
      val aucRow = time("exact AUC over 10M rows") {
        graft.ext.Eval.auc(scored, "y", "s").collect()(0)
      }
      println(s"[soak] auc=${aucRow.getDouble(2)} (positives shifted +20 of 100-wide noise → ~0.68)")
    }

    section("r6b") {
      // skew mitigation A/B/C: 10M-row fact with 90% of rows on ONE key
      // joining a 2M-row dim (too big to broadcast) — plain SMJ with
      // AQE skew-join ON, OFF, and saltedJoin. Run on a cloned session
      // so conf flips can't leak.
      val ss = spark.newSession()
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import org.apache.spark.sql.functions.{broadcast => _}
      val fact = ss.range(10000000).select(
        when(pmod(col("id"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(2000000))).as("k"),
        col("id").as("v"))
      val dim = ss.range(2000000).select(col("id").as("dk"),
        (col("id") % 7).as("dv"))
      def plain() = fact.join(dim, fact("k") === dim("dk")).agg(
        count(lit(1)), sum(col("dv"))).collect()(0)
      ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val a = time("skewed join, AQE skew-join ON")(plain())
      ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val b = time("skewed join, AQE skew-join OFF")(plain())
      ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val c = time("saltedJoin(32), FULL dim replicated") {
        graft.ops.Enrich.saltedJoin(fact, dim, "k", "dk", saltBuckets = 32)
          .agg(count(lit(1)), sum(col("dv"))).collect()(0)
      }
      val hd = time("skewJoin(32), hot key only") {
        graft.ops.Enrich.skewJoin(fact, dim, "k", "dk",
            hotKeys = Seq(0L), saltBuckets = 32)
          .agg(count(lit(1)), sum(col("dv"))).collect()(0)
      }
      println(s"[soak] results equal: ${a == b && b == c && c == hd} ($a)")
    }

    section("r6c") {
      // paged connector at dump scale: 2M records published as a
      // 1000-page dump through the write path, scanned back in
      // parallel, and page-predicate pruning measured
      val dir = s"$base/pagedump"
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
        f.delete()
      }
      rmrf(new java.io.File(dir))
      time("publish 2M records as 1000 pages (connector write)") {
        spark.range(2000000)
          .selectExpr("to_json(struct(id, id % 97 AS g)) AS payload")
          .repartition(1000)
          .write.format("graft-paged")
          .option("dir", dir).option("prefix", "dump").mode("append").save()
      }
      val n = time("full parallel scan + parse (1001 page partitions)") {
        spark.read.format("graft-paged")
          .option("dir", dir).option("prefix", "dump").load()
          .selectExpr("get_json_object(payload, '$.id') AS id").count()
      }
      println(s"[soak] scanned $n records (expect 2000000)")
      val pruned = time("pruned scan: page < 10") {
        spark.read.format("graft-paged")
          .option("dir", dir).option("prefix", "dump").load()
          .where(col("page") < 10).count()
      }
      println(s"[soak] pruned scan rows: $pruned (10 of 1001 pages opened)")
    }

    section("r7") {
      // --- association rules over 10M basket rows (1M baskets, 1k vocab) ---
      val baskets = spark.range(10000000).select(
        (col("id") / 10).cast("long").as("basket"),
        pmod(xxhash64(col("id")), lit(1000)).as("item"))
      val nRules = time("associationRules 10M rows / 1M baskets / 1k items") {
        // mean pair support ≈ 45M basket-pairs / 500k pair types ≈ 90
        graft.ext.Behavior.associationRules(baskets, "basket", "item",
          minPairCount = 100L).count()
      }
      println(s"[soak] assoc rules: $nRules (pair space bounded per basket ≤ C(10,2))")

      // --- hierarchy levels over a 10M-node tree (fan-out 10, depth 7) ---
      val edges10 = spark.range(1, 10000000).select(
        col("id").as("child"), (col("id") / 10).cast("long").as("parent"))
      val maxLv = time("hierarchyLevels 10M-edge tree, maxDepth 10") {
        graft.ext.Graph.hierarchyLevels(edges10, "child", "parent", maxDepth = 10)
          .agg(max("level"), count(lit(1))).collect()(0)
      }
      println(s"[soak] hierarchy: maxLevel=${maxLv.get(0)} nodes=${maxLv.get(1)} (expect 7 / 10M)")

      // --- CDC diff + apply round-trip at 10M rows ---
      val truth10 = spark.range(10000000).select(col("id").as("k"),
        (col("id") % 97).as("v"), pmod(xxhash64(col("id")), lit(1000)).as("w"))
      val corrupted10 = truth10.filter(col("k") % 7 =!= 0)
        .withColumn("v", when(col("k") % 5 === 0, col("v") + 1).otherwise(col("v")))
        .unionByName(spark.range(3).select((col("id") + 20000000L).as("k"),
          lit(-1L).as("v"), lit(-1L).as("w")))
      val delta = time("CDC diffFull + applyChanges + verify, 10M-row snapshot") {
        val feed = graft.ops.Snapshot.diffFull(corrupted10, truth10, Seq("k"))
        val healed = graft.ops.Snapshot.applyChanges(corrupted10, feed, Seq("k"))
        healed.unionByName(truth10).groupBy("k", "v", "w")
          .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      }
      println(s"[soak] CDC round-trip asymmetric-diff rows: $delta (expect 0)")

      // --- interval-overlap join: 5M x 200k intervals, binned ---
      val left10 = spark.range(5000000).select(col("id").as("lid"),
        (pmod(xxhash64(col("id")), lit(1000000)) / lit(10.0)).as("llo"))
        .withColumn("lhi", col("llo") + lit(5.0))
      val right10 = spark.range(200000).select(col("id").as("rid"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000000)) / lit(10.0)).as("rlo"))
        .withColumn("rhi", col("rlo") + lit(20.0))
      val nOver = time("binnedIntervalJoin 5M x 200k (widths 5/20, bin 25)") {
        graft.ops.Intervals.binnedIntervalJoin(left10, "llo", "lhi",
          right10, "rlo", "rhi", binSize = 25.0).count()
      }
      // overlap prob per pair ≈ (5+20)/100000-unit space → ~25/1e5;
      // 5e6 × 2e5 × 2.5e-4 ≈ 2.5e8 pairs
      println(s"[soak] interval overlaps: $nOver (expect ~2.5e8)")
    }

    section("r7b") {
      // --- line-level (CCNet) dedup over a 500k-page web-corpus shape ---
      // each page: 8 unique content lines + 3 boilerplate lines shared
      // across ~all pages of its "site" (1000 sites) → ~27% of lines
      // must drop, line-df table has 4M unique + 3k hot keys
      val pages = spark.range(500000).select(col("id").as("page_id"),
        concat_ws("\n",
          (Seq(concat(lit("NAV site"), pmod(col("id"), lit(1000)))) ++
            (0 until 8).map(j => concat_ws(" ", (0 until 10).map(k =>
              concat(lit("tok"), pmod(xxhash64(col("id"), lit(j * 10 + k)), lit(500000)))): _*)) ++
            Seq(concat(lit("FOOTER site"), pmod(col("id"), lit(1000))),
              lit("COPYRIGHT 2026 ALL RIGHTS RESERVED"))): _*).as("text"))
        .localCheckpoint(true)
      val out = time("dedupLines 500k pages / 5.5M lines (maxDf=3)") {
        graft.ext.TextOps.dedupLines(pages, "text", "page_id", maxDf = 3)
          .agg(sum("n_lines"), sum("n_kept")).collect()(0)
      }
      // 11 lines/page; NAV+FOOTER (500/site) + COPYRIGHT (500k) exceed
      // df 3 → exactly 8 content lines survive per page (modulo rare
      // cross-page content-line hash collisions)
      println(s"[soak] line dedup: lines=${out.get(0)} kept=${out.get(1)} (expect 5.5M -> ~4M)")
    }
    spark.stop()
  }
}
