package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — similarity search and vector quantization.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesAnn {
  import ExtQueries.{hashPinVerdict, textRoundtrip, xlsxArtifactHash, xlsxBytePins}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ext: similarity search ----
    "x_ann_bruteforce" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 10)
        .orderBy("query_id", "rank")
    }),

    "x_kmeans" -> ((s, d) => {
      // auditable clustering: one FNV-seeded Lloyd step over the
      // embedding corpus (k=8), summarized as per-cluster size + mean
      // cosine-to-centroid. Every step — seeding hash, decimal-exact
      // centroid means, kernel accumulation order, tie-break — replays
      // in the DuckDB oracle byte-for-byte (unlike the xxhash-seeded
      // IVF rows, which are rows-only by design).
      val e = t(s, d, "embeddings")
      Similarity.kmeansAssign(e, "embedding", "vec_id", k = 8)
        .groupBy("cell")
        .agg(count(lit(1)).as("n"),
          round(sum(col("cos").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_cos"))
        .orderBy("cell")
    }),

    "x_ann_ivf" -> ((s, d) => {
      // rows-only: approximate (IVF probe) — no exact oracle by design.
      // r13: seeded by trained k-means|| (trainedCentroids — sampled
      // derandomized init + 1 Lloyd polish) instead of hash means: the
      // gated A/B (tools/AnnSeedProbe) measured recall@10 0.54→0.60 at
      // this exact probe budget for +0.4 s; hash seeding remains the
      // cheap fallback (coarseCentroids, gated by x_ann_ivf_recall)
      val e = t(s, d, "embeddings")
      // trainedCentroids already returns a pinned frame — no wrapper
      val centroids =
        Similarity.trainedCentroids(e, "embedding", "vec_id", nCells = 16)
      val assigned = Similarity.assignCells(e, centroids, "embedding", "vec_id")
      Similarity.ivfTopK(assigned, centroids, e.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 10, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivf_trained_recall" -> ((s, d) => {
      // Recall gates for the SHIPPING (r13 flagship) ANN configs:
      // trained k-means|| seeding (trainedCentroids — sampled
      // derandomized init + 1 Lloyd polish, exactly what x_ann_ivf /
      // x_ann_ivfpq build) at the x_ann_ivf_recall probe budgets. On
      // these near-uniform synthetic embeddings trained seeding ties
      // or beats hash (IVF 0.79–0.81, IVF-PQ 0.75–0.93 measured at
      // sf0.001/0.01/0.1 via tools/AnnSeedGateProbe — same 0.70/0.65
      // floors as the hash-seeded gates); its real advantage — sparse
      // clusters hash density never seeds — is pinned by
      // SimilaritySpec's skewed 300/12/6 fixture. Structural contract
      // gated beside recall: exactly nCells centroids, full 64-dim.
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val cents = Similarity.trainedCentroids(e, "embedding", "vec_id",
        nCells = 16)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
      val ivf = Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
        k = 10, nProbe = 8)
      val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
      val recallOk = Similarity.recallAtK(ivf, brute)
        .agg((avg(col("recall")) >= 0.7).as("ok"))
        .select(lit("trained_ivf_mean_recall10_ge_070").as("check_name"),
          col("ok"))
      val shapeOk = cents
        .agg((count(lit(1)) === 16 &&
          min(size(col("centroid"))) === 64 &&
          max(size(col("centroid"))) === 64).as("ok"))
        .select(lit("trained_centroids_shape").as("check_name"), col("ok"))
      // the trained IVF-PQ flagship config, graded against the same
      // raw-vector brute force (cosine ranking is normalization-
      // invariant, so one exact pass grades both paths)
      val en = e.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val qn = en.filter(col("id") < 20)
      val centsN = Similarity.trainedCentroids(en, "v", "id", nCells = 16)
      val (rcb, enc) = graft.ext.Pq.ivfPqIndex(en, centsN, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val ivfpq = graft.ext.Pq.ivfPqRerankTopK(enc, centsN, rcb, qn, en,
        "v", "id", k = 10, shortlistK = 200, nProbe = 12,
        dim = 64, m = 8, ksub = 16)
      val ivfpqOk = Similarity.recallAtK(ivfpq, brute)
        .agg((avg(col("recall")) >= 0.65).as("ok"))
        .select(lit("trained_ivfpq_mean_recall10_ge_065").as("check_name"),
          col("ok"))
      recallOk.unionByName(shapeOk).unionByName(ivfpqOk).orderBy("check_name")
    }),

    "x_ann_mode_equivalence" -> ((s, d) => {
      // GATE for the r16 partitioned-probe execution mode: the fused
      // operator's two modes (identity-broadcast vs cell-co-partitioned,
      // selected by spark.graft.ann.probeBroadcastThreshold) must be
      // result-INVISIBLE. Engine-side two-direction equality of the
      // full ivfTopK output and of the near-dup pair scan (fused
      // partitioned vs the compositional join), as literal verdicts.
      // The mode is baked into the plan at BUILD time, so building one
      // frame per conf setting then comparing lazily is sound.
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val cents = Similarity.refineCentroids(e,
        Similarity.coarseCentroids(e, "embedding", "vec_id", nCells = 16),
        "embedding", "vec_id", iterations = 1)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
      val key = graft.plans.SdcTopKPlan.probeBroadcastThresholdKey
      // restore the PRIOR value (not unset): the gate must not clobber
      // a user/session-set threshold for the rest of the session
      def withThreshold[A](v: Option[String])(body: => A): A = {
        val prior = s.conf.getOption(key)
        v.foreach(s.conf.set(key, _))
        try body finally prior match {
          case Some(p) => s.conf.set(key, p)
          case None => s.conf.unset(key)
        }
      }
      // each equality reads BOTH sides twice (two-direction exceptAll)
      // — persist the compared frames so neither plan re-executes per
      // direction (the q_stream_pq_append lesson); they are tiny
      def eq(a: DataFrame, b: DataFrame): Boolean = {
        val ac = a.persist(); val bc = b.persist()
        try (ac.exceptAll(bc).count() + bc.exceptAll(ac).count()) == 0
        finally { ac.unpersist(); bc.unpersist() }
      }
      val bcast = withThreshold(Some(Long.MaxValue.toString)) {
        Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
          k = 10, nProbe = 4) }
      val part = withThreshold(Some("-1")) {
        Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
          k = 10, nProbe = 4) }
      val topkEq = eq(bcast, part)
      // pair scan: the ALWAYS-partitioned fused path vs the
      // compositional broadcast join it replaced. Corpus bounded by a
      // deterministic modulus — an equality gate needs representative
      // pairs, not the whole 10× pair space (the quadratic term is
      // what the fused operator exists to control)
      val pe = e.filter(pmod(col("vec_id"), lit(3)) === 0)
      val fusedPairs = Dedup.embeddingNearDupsBucketed(pe, "embedding",
        "vec_id", threshold = 0.9, nCells = 8, nProbe = 2,
        useFused = Some(true))
      val joinPairs = Dedup.embeddingNearDupsBucketed(pe, "embedding",
        "vec_id", threshold = 0.9, nCells = 8, nProbe = 2,
        useFused = Some(false))
      val pairEq = eq(fusedPairs, joinPairs)
      // r17: the UNORDERED pair mode (cospairu — the incremental
      // batch-vs-store scan) gated the same way: fused vs the
      // compositional equi-join it replaced, on an overlapping-id
      // split so the no-self-exclusion semantics are exercised
      val batch = e.filter(col("vec_id") < 30)
      val store = e.filter(col("vec_id") >= 15 && col("vec_id") < 120)
      val fusedAgainst = Dedup.embeddingNearDupsAgainst(batch, store,
        "embedding", "vec_id", threshold = 0.3, nCells = 8, nProbe = 2,
        useFused = Some(true))
      val joinAgainst = Dedup.embeddingNearDupsAgainst(batch, store,
        "embedding", "vec_id", threshold = 0.3, nCells = 8, nProbe = 2,
        useFused = Some(false))
      val againstEq = eq(fusedAgainst, joinAgainst)
      import s.implicits._
      Seq(("pair_scan_fused_equals_compositional", pairEq),
          ("topk_partitioned_equals_broadcast", topkEq),
          ("against_fused_equals_compositional", againstEq))
        .toDF("check_name", "ok").orderBy("check_name")
    }),

    "x_ann_ivf_recall" -> ((s, d) => {
      // ORACLE-GATED quality bound for the HASH-SEEDED ANN paths —
      // since r13 the cheap FALLBACK (the flagships seed via trained
      // k-means||, gated by x_ann_ivf_trained_recall): mean recall@10
      // vs the exact brute force, computed ENGINE-side for both the
      // IVF probe path and the FAISS-style IVF-PQ residual path
      // (deterministic: hash-seeded centroids, deterministic ties),
      // returned as literal bound verdicts the driver can gate on. The synthetic embeddings are near-UNIFORM — ANN's worst
      // case, where top-10 neighbors scatter across cells — so the
      // bounds are what these probe budgets actually deliver on that
      // data family, measured at sf0.001/0.01/0.1 with margin:
      // IVF nProbe=8/16 → 0.78–0.80 (bound 0.70); IVF-PQ nProbe=12,
      // shortlist=200 → 0.72–0.93 (bound 0.65). On clustered real
      // corpora the same configs clear 0.9 (SimilaritySpec/PqSpec).
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val cents = Similarity.refineCentroids(e,
        Similarity.coarseCentroids(e, "embedding", "vec_id", nCells = 16),
        "embedding", "vec_id", iterations = 1)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
      val ivf = Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
        k = 10, nProbe = 8)
      val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
      val ivfOk = Similarity.recallAtK(ivf, brute)
        .agg((avg(col("recall")) >= 0.7).as("ok"))
        .select(lit("ivf_mean_recall10_ge_070").as("check_name"), col("ok"))
      // IVF-PQ on normalized vectors, same residual index as x_ann_ivfpq
      val en = e.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val qn = en.filter(col("id") < 20)
      val centsN = Similarity.refineCentroids(en,
        Similarity.coarseCentroids(en, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      val (rcb, enc) = graft.ext.Pq.ivfPqIndex(en, centsN, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val ivfpq = graft.ext.Pq.ivfPqRerankTopK(enc, centsN, rcb, qn, en,
        "v", "id", k = 10, shortlistK = 200, nProbe = 12,
        dim = 64, m = 8, ksub = 16)
      // cosine ranking is normalization-invariant: the raw-vector brute
      // force IS the normalized-vector ground truth — one exact pass
      // grades both paths
      val ivfpqOk = Similarity.recallAtK(ivfpq, brute)
        .agg((avg(col("recall")) >= 0.65).as("ok"))
        .select(lit("ivfpq_mean_recall10_ge_065").as("check_name"), col("ok"))
      ivfOk.unionByName(ivfpqOk).orderBy("check_name")
    }),

    "x_ann_pq_recall" -> ((s, d) => {
      // ORACLE-GATED quality bound for the PURE-PQ path (closes the one
      // component x_ann_pq left rows-only): mean recall@10 of the
      // ADC-shortlist+exact-rerank pipeline vs brute force, computed
      // engine-side and returned as literal bound verdicts. The whole
      // path is deterministic (FNV-seeded codebooks, deterministic
      // ties), so per-SF recall is a constant — any drop is a code
      // regression, not noise. Bounds measured via
      // tools/PqRecallProbe at sf0.001/0.01/0.1 on the near-uniform
      // synthetic embeddings (ANN worst case):
      //   shortlist=200 → 0.935 / 0.940 / 0.765  (bound 0.70)
      //   shortlist=30  → 0.555 / 0.435 / 0.255  (bound 0.15; random
      //     chance is k/n ≤ 0.02, so 0.15 still proves the codes rank)
      // shortlist=30 gates the exact x_ann_pq production budget;
      // shortlist=200 gates the headroom config at the IVF-PQ budget.
      val raw = t(s, d, "embeddings")
      val e = raw.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val q = e.filter(col("id") < 20)
      val brute = Similarity.bruteForceTopK(
        raw, raw.filter(col("vec_id") < 20), "embedding", "vec_id", k = 10)
      val cb = graft.ext.Pq.trainCodebooks(e, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val enc = graft.ext.Pq.encode(e, cb, "v", "id", dim = 64, m = 8, ksub = 16)
      def check(shortlist: Int, name: String, bound: Double) =
        Similarity.recallAtK(
            graft.ext.Pq.adcRerankTopK(enc, cb, q, e, "v", "id",
              k = 10, shortlistK = shortlist, dim = 64, m = 8, ksub = 16),
            brute)
          .agg((avg(col("recall")) >= bound).as("ok"))
          .select(lit(name).as("check_name"), col("ok"))
      check(200, "pq_adc200_mean_recall10_ge_070", 0.70)
        .unionByName(check(30, "pq_adc30_mean_recall10_ge_015", 0.15))
        .orderBy("check_name")
    }),

    "x_ann_pq_prerank_recall" -> ((s, d) => {
      // ORACLE-GATED quality verdicts for the PQ-SDC PRE-RANKED paths
      // (the r14 all-corpus/self-join cost cut): candidates are ranked
      // by the symmetric PQ statistic — m table reads against ONE
      // shared broadcast code-pair table, no per-query ADC LUTs, which
      // a corpus-sized query batch cannot broadcast — and only a
      // per-query shortlist (topk) / the margin survivors (near-dup)
      // reach the exact cosine kernel. Budgets measured via
      // tools/SdcPrerankProbe at sf0.001/0.01/0.1 on the near-uniform
      // synthetic embeddings (ANN's worst case — quantized scores are
      // noisiest when true neighbors are weak):
      //   topk m=16/ksub=16, nProbe=4, preRankC=300 → 1.000/1.000/0.985
      //     vs the exact-scored ivfTopK on the same index (bound 0.90)
      //   neardup margin=0.3 → 1.000/0.947/1.000 recall, fp=0 at all
      //     three SFs (bound 0.90; precision 1.0 by construction —
      //     the fp check proves it)
      // The whole path is deterministic (hash-seeded centroids +
      // FNV-seeded codebooks, deterministic ties) — per-SF recall is a
      // constant; any drop is a code regression, not noise.
      val raw = t(s, d, "embeddings")
      val en = raw.select(col("vec_id").as("id"),
        graft.ext.Pq.normalized(col("embedding")).as("v"))
      val cents = Similarity.refineCentroids(en,
        Similarity.coarseCentroids(en, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      // ONE assignment pass feeds the exact-IVF side, the prerank
      // corpus encode, AND the shortlist re-rank fetch (r15: this was
      // the slowest registry row because the gate computes both the
      // preranked and the exact path — persist the shared index
      // instead of re-deriving it per consumer; session-lifetime cache,
      // ~dim·4 bytes/vector, the sessionsRaw precedent)
      val assigned = Similarity.assignCells(en, cents, "v", "id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = en.filter(col("id") < 20)
      val cb = graft.ext.Pq.trainCodebooks(en, "v", "id",
        dim = 64, m = 16, ksub = 16, iterations = 1)
      val exactIvf = Similarity.ivfTopK(assigned, cents, q, "v", "id",
        k = 10, nProbe = 4)
      val pre = graft.ext.Pq.ivfSdcPrerankTopK(assigned, cents, cb, q,
        "v", "id", k = 10, nProbe = 4, preRankC = 300,
        dim = 64, m = 16, ksub = 16)
      val topkOk = Similarity.recallAtK(pre, exactIvf)
        .agg((avg(col("recall")) >= 0.9).as("ok"))
        .select(lit("sdc_prerank_vs_ivf_recall10_ge_090").as("check_name"),
          col("ok"))
      // near-dup pre-filter: graded on the bounded slice against the
      // exact all-pairs operator (the x_embed_neardup_bucketed pattern).
      // The row's own codebook is trained on the identical normalized
      // corpus at the same (dim, m, ksub) — pass it in so the near-dup
      // path skips its (byte-identical) internal retraining
      val got = Dedup.embeddingNearDupsBucketedPq(raw, "embedding", "vec_id",
          threshold = 0.4, nCells = 16, nProbe = 4, margin = 0.3,
          m = 16, ksub = 16, prebuiltCodebooks = Some(cb))
        .filter(col("id_a") < 300 && col("id_b") < 300)
        .select(col("id_a"), col("id_b"))
      val exactP = Dedup.embeddingNearDups(
          raw.filter(col("vec_id") < 300), "embedding", "vec_id",
          threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val nExact = exactP.agg(count(lit(1)).as("n_exact"))
      val nGot = got.agg(count(lit(1)).as("n_got"))
      val nInter = got.join(exactP, Seq("id_a", "id_b"))
        .agg(count(lit(1)).as("n_inter"))
      val ndChecks = nInter.crossJoin(broadcast(nExact)).crossJoin(broadcast(nGot))
        .select(explode(array(
          struct(lit("neardup_pq_recall_ge_090").as("check_name"),
            // vacuous bound: zero exact pairs on the graded slice means
            // nothing to recall — pass, don't 0.0/0.0-NaN-fail (the
            // SdcPrerankProbe convention; the shipped fixtures do have
            // pairs, this guards degenerate slices)
            (col("n_exact") === 0 ||
              col("n_inter").cast("double") / col("n_exact") >= 0.9).as("ok")),
          struct(lit("neardup_pq_no_false_positives").as("check_name"),
            (col("n_inter") === col("n_got")).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
      topkOk.unionByName(ndChecks).orderBy("check_name")
    }),

    "x_ann_pq" -> ((s, d) => {
      // rows-only by design (the k-means shortlist is not SQL-
      // replayable; PqSpec gates recall and proves ADC == dot-on-
      // decoded). Full production pipeline: train 8×16 codebooks,
      // encode 64-dim floats to 8 byte codes (32× compression), ADC-
      // shortlist 30 per query from the codes, exact-rerank to top-10
      val e = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          graft.ext.Pq.normalized(col("embedding")).as("v"))
      val queries = e.filter(col("id") < 5)
      val cb = graft.ext.Pq.trainCodebooks(e, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      val enc = graft.ext.Pq.encode(e, cb, "v", "id", dim = 64, m = 8, ksub = 16)
      graft.ext.Pq.adcRerankTopK(enc, cb, queries, e, "v", "id",
          k = 10, shortlistK = 30, dim = 64, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    "x_ann_ivfpq" -> ((s, d) => {
      // rows-only by design. FAISS-style IVF-PQ: coarse cells → PQ on
      // RESIDUALS (codes quantize local offsets, not the global
      // spread) → probe + ADC shortlist → exact re-rank. The scale
      // path for ANN over a corpus whose full vectors don't fit hot
      // storage: the scan side holds cell + 8 bytes per vector
      val e = t(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          graft.ext.Pq.normalized(col("embedding")).as("v"))
      // lean build settings for the per-round driver run: quality knobs
      // (Lloyd depth, refine) are gated in PqSpec + the 202k soak; an
      // index is built ONCE and searched many times in production, not
      // rebuilt per query as this end-to-end row does. r13: coarse
      // cells seeded by trained k-means|| (sampled init + 1 Lloyd) —
      // the gated A/B (tools/AnnSeedProbe) measured recall@10
      // 0.28→0.34 at this budget AND 0.3 s faster than the old
      // hash-mean + refine build (the sampled driver-side init is
      // cheaper than a posexplode mean pass over the corpus)
      val cents = graft.ext.Similarity.trainedCentroids(e, "v", "id",
        nCells = 16)
      val (rcb, enc) = graft.ext.Pq.ivfPqIndex(e, cents, "v", "id",
        dim = 64, m = 8, ksub = 16, iterations = 1)
      graft.ext.Pq.ivfPqRerankTopK(enc, cents, rcb, e.filter(col("id") < 5), e,
          "v", "id", k = 10, shortlistK = 30, nProbe = 4,
          dim = 64, m = 8, ksub = 16)
        .orderBy("query_id", "rank")
    }),

    // ---- determinism-hash pins for the rows-only rows ----
    // The four no-oracle outputs (3 approximate ANN top-k + the zlib
    // ratio) are deterministic BY CONSTRUCTION (FNV/xxhash seeding,
    // deterministic ties, per-partition codec re-init), so their
    // content hash at a given SF is a constant: any changed hash is a
    // code regression, never noise. Each pin re-runs its raw row and
    // compares an order-insensitive engine-side hash against the
    // constant measured at sf0.001/0.01/0.1 (tools/HashPinProbe).
    // Quality stays bounded by the recall/ordering verdict rows; these
    // convert "rows-only" into a regression detector at the gate SFs.
    // Unpinned dirs (scaled soak datasets are regenerated with varying
    // perturbation) pass trivially by design.
    "x_ann_ivf_hash" -> ((s, d) => hashPinVerdict(s, d, "x_ann_ivf")),

    "x_ann_pq_hash" -> ((s, d) => hashPinVerdict(s, d, "x_ann_pq")),

    "x_ann_ivfpq_hash" -> ((s, d) => hashPinVerdict(s, d, "x_ann_ivfpq")),

    "x_hard_negatives" -> ((s, d) => {
      // DPR-style hard-negative mining: for each query embedding, the
      // 10 nearest corpus vectors with a DIFFERENT label — the
      // contrastive-training negatives closest to the decision
      // boundary, predicate fused before ranking so k always fills
      val e = t(s, d, "embeddings")
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 5),
          "embedding", "vec_id", "label", k = 10)
        .orderBy("query_id", "rank")
    }),

    "x_embed_meanpool" -> ((s, d) =>
      // chunk→document embedding pooling: groups of 10 chunk vectors
      // mean-pool to one doc vector (decimal-exact per-dim means,
      // 9 dp), emitted as (doc, dim, m) rows for the replay
      Similarity.meanPool(t(s, d, "embeddings"), "embedding",
          expr("vec_id div 10"))
        .select(col("group").as("doc"),
          posexplode(col("pooled")).as(Seq("dim", "m")))
        .orderBy("doc", "dim")),

    "x_sq_quantize" -> ((s, d) =>
      // SQ8 embedding codec readout: per-vector scale, code checksum,
      // max code magnitude, max reconstruction error. Every step is
      // single-IEEE-op deterministic (no training state), so unlike
      // the PQ rows this codec replays EXACTLY in the oracle
      graft.ext.Sq.quantize(t(s, d, "embeddings"), "embedding", "vec_id",
          keepVec = true)
        .select(col("vec_id"),
          round(col("scale"), 9).as("scale9"),
          aggregate(col("codes"), lit(0L),
            (a, c) => a + c.cast("long")).as("sum_codes"),
          array_max(transform(col("codes"), c => abs(c))).as("max_code"),
          round(array_max(zip_with(col("embedding"), col("codes"),
            (x, c) => abs(x.cast("double") - c.cast("double") * col("scale")))),
            9).as("max_err9"))
        .orderBy("vec_id")),

    "x_sq_recall" -> ((s, d) => {
      // ORACLE-GATED quality + contract bounds for the SQ8 tier: mean
      // recall@10 of exact search over RECONSTRUCTED vectors vs the
      // full-precision brute force (the whole point of SQ8: ~4× less
      // scan IO at near-exact recall — tools/SqRecallProbe measured
      // 1.000 / 0.990 / 0.985 at sf0.001/0.01/0.1 on the near-uniform
      // synthetic embeddings; bound 0.95 leaves margin),
      // plus the codec's own guarantees: per-element reconstruction
      // error ≤ scale/2 and codes within ±127.
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
      val enc = graft.ext.Sq.quantize(e, "embedding", "vec_id")
      val sq = graft.ext.Sq.sqTopK(enc, q, "embedding", "vec_id", k = 10)
      val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
      val recOk = Similarity.recallAtK(sq, brute)
        .agg((avg(col("recall")) >= 0.95).as("ok"))
        .select(lit("sq8_mean_recall10_ge_095").as("check_name"), col("ok"))
      val contract = graft.ext.Sq
        .quantize(e, "embedding", "vec_id", keepVec = true)
        .select(
          (array_max(zip_with(col("embedding"), col("codes"),
            (x, c) => abs(x.cast("double") - c.cast("double") * col("scale"))))
            <= col("scale") * 0.5 + lit(1e-12)).as("b"),
          (array_max(transform(col("codes"), c => abs(c))) <= 127).as("r"))
        .agg(expr("bool_and(b)").as("bOk"), expr("bool_and(r)").as("rOk"))
        .select(explode(array(
          struct(lit("sq8_err_le_half_scale").as("check_name"),
            col("bOk").as("ok")),
          struct(lit("sq8_codes_in_range").as("check_name"),
            col("rOk").as("ok")))).as("s"))
        .select(col("s.check_name").as("check_name"), col("s.ok").as("ok"))
      recOk.unionByName(contract).orderBy("check_name")
    }),
  )

  val oracles: Map[String, String] = Map(
    "x_ann_mode_equivalence" ->
      """SELECT * FROM (VALUES ('against_fused_equals_compositional', TRUE),
        |  ('pair_scan_fused_equals_compositional', TRUE),
        |  ('topk_partitioned_equals_broadcast', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_ann_ivf_recall" ->
      """SELECT * FROM (VALUES ('ivf_mean_recall10_ge_070', TRUE),
        |  ('ivfpq_mean_recall10_ge_065', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_ann_ivf_trained_recall" ->
      """SELECT * FROM (VALUES ('trained_centroids_shape', TRUE),
        |  ('trained_ivf_mean_recall10_ge_070', TRUE),
        |  ('trained_ivfpq_mean_recall10_ge_065', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_ann_pq_recall" ->
      """SELECT * FROM (VALUES ('pq_adc200_mean_recall10_ge_070', TRUE),
        |  ('pq_adc30_mean_recall10_ge_015', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_ann_pq_prerank_recall" ->
      """SELECT * FROM (VALUES ('neardup_pq_no_false_positives', TRUE),
        |  ('neardup_pq_recall_ge_090', TRUE),
        |  ('sdc_prerank_vs_ivf_recall10_ge_090', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_ann_ivf_hash" ->
      """SELECT * FROM (VALUES ('x_ann_ivf_content_hash_pinned', TRUE))
        |AS t(check_name, ok)""".stripMargin,

    "x_ann_pq_hash" ->
      """SELECT * FROM (VALUES ('x_ann_pq_content_hash_pinned', TRUE))
        |AS t(check_name, ok)""".stripMargin,

    "x_ann_ivfpq_hash" ->
      """SELECT * FROM (VALUES ('x_ann_ivfpq_content_hash_pinned', TRUE))
        |AS t(check_name, ok)""".stripMargin,

    "x_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        |  FROM c, q WHERE c.corpus_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, corpus_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // k-means single-Lloyd-step replay: FNV cell seeding (8 | 2⁶⁴, so
    // unsigned %8 == Spark's signed pmod), engine-agnostic centroid
    // means, same kernel accumulation order as the engine's zip_with
    // fold, same (cos desc, cell asc) tie-break
    "x_kmeans" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
        |cells AS (
        |  SELECT CAST(${fnvSql("(CAST(vec_id AS VARCHAR))")} % 8 AS BIGINT) AS cell, v FROM e),
        |d AS (
        |  SELECT cell, unnest([{'dim': i, 'x': CAST(v[i] AS DOUBLE)} FOR i IN range(1, len(v) + 1)]) AS s
        |  FROM cells),
        |dx AS (SELECT cell, s.dim AS dim, s.x AS x FROM d),
        |cent AS (
        |  SELECT cell, dim, round(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*), 9) AS m
        |  FROM dx GROUP BY cell, dim),
        |centv AS (SELECT cell, list(m ORDER BY dim) AS c FROM cent GROUP BY cell),
        |scored AS (
        |  SELECT e.vec_id, centv.cell,
        |    round(
        |      list_sum(list_transform(range(1, len(e.v) + 1), i -> CAST(e.v[i] AS DOUBLE) * centv.c[i]))
        |      / (sqrt(list_sum(list_transform(range(1, len(e.v) + 1), i -> CAST(e.v[i] AS DOUBLE) * CAST(e.v[i] AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(range(1, len(centv.c) + 1), i -> centv.c[i] * centv.c[i])))), 6) AS cos
        |  FROM e, centv),
        |assigned AS (
        |  SELECT vec_id, cell, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
        |  FROM scored)
        |SELECT cell, count(*) AS n,
        |  round(CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_cos
        |FROM assigned WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    // hard-negative replay: the brute-force cosine CTE with the
    // label-mismatch predicate fused before ranking (null-safe: an
    // unlabeled corpus row negates any labeled query)
    "x_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label AS c_label
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, q.q_label, c.corpus_id, c.c_label,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        |  FROM c, q
        |  WHERE c.corpus_id <> q.query_id
        |    AND c.c_label IS DISTINCT FROM q.q_label),
        |ranked AS (
        |  SELECT query_id, q_label, corpus_id, c_label, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, q_label, corpus_id, c_label AS neg_label,
        |  round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // mean-pool replay: same struct-unnest explode as the x_kmeans
    // centroid fragment, same decimal(28,10) per-dim mean, 9 dp.
    // ROUNDING PARITY: Spark's round(double, 9) is HALF_UP on
    // BigDecimal.valueOf(d) — the SHORTEST decimal representation of
    // the double, not its exact binary expansion. DuckDB's plain
    // round(double, 9) multiplies by 1e9 in floating point, which can
    // mis-tie within ~1 ulp of a half boundary (hit once in 320k
    // samples at the 10× soak). The faithful replay rounds the
    // shortest round-trip form: VARCHAR cast (shortest repr, same
    // unique digits Java's Double.toString emits) → DECIMAL(38,30)
    // (captures all ≤17 significant digits of any value near a 9-dp
    // half boundary — scale 18 truncated 19-digit reprs back onto the
    // boundary) → round half-away-from-zero (== HALF_UP).
    "x_embed_meanpool" ->
      """WITH e AS (SELECT vec_id // 10 AS doc, embedding AS v FROM embeddings),
        |d AS (
        |  SELECT doc, unnest([{'dim': CAST(i - 1 AS INTEGER), 'x': CAST(v[i] AS DOUBLE)}
        |                      FOR i IN range(1, len(v) + 1)]) AS s
        |  FROM e),
        |dx AS (SELECT doc, s.dim AS dim, s.x AS x FROM d)
        |SELECT doc, dim,
        |  CAST(round(CAST(CAST(CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,30)), 9) AS DOUBLE) AS m
        |FROM dx GROUP BY doc, dim ORDER BY doc, dim""".stripMargin,

    // SQ8 codec replay: same float→double casts, same single division
    // per element, same round-half-away-from-zero (both engines), same
    // code×scale reconstruction — bit-for-bit, no training state
    "x_sq_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, embedding, scale,
        |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |                x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER))
        |    END AS codes
        |  FROM q)
        |SELECT vec_id,
        |  round(scale, 9) AS scale9,
        |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS sum_codes,
        |  list_max(list_transform(codes, c -> abs(c))) AS max_code,
        |  round(list_max([abs(CAST(embedding[i] AS DOUBLE) - codes[i] * scale)
        |                  FOR i IN range(1, len(embedding) + 1)]), 9) AS max_err9
        |FROM c ORDER BY vec_id""".stripMargin,

    "x_sq_recall" ->
      """SELECT * FROM (VALUES
        |  ('sq8_codes_in_range', TRUE),
        |  ('sq8_err_le_half_scale', TRUE),
        |  ('sq8_mean_recall10_ge_095', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,
  )
}
