package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorExpressions

/** Product quantization for embedding search (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector is split into `m` subvectors; each subspace gets its own
  * `ksub`-entry codebook (k-means), and a vector stores only its m code
  * ids — dim×4 bytes shrink to m bytes (64-dim float → 8 bytes at
  * m=8, a 32× compression), which is what lets a 100 TB embedding
  * corpus fit hot storage / memory for scanning. Queries score encoded
  * vectors with ADC (asymmetric distance): one m×ksub lookup table of
  * exact subspace dot products per query, then each corpus row costs m
  * array lookups instead of dim multiplies.
  *
  * Spark shape: training collects only the tiny codebook (m·ksub·dim/m
  * doubles) to the driver between Lloyd steps (same pinning rationale
  * as [[Similarity.materializeCentroids]]); encoding is a NARROW map
  * (the per-sub argmax is inlined as codegen'd dot kernels — no
  * explode, no shuffle); the ADC scan is a narrow map over the encoded
  * corpus with broadcast per-query LUTs, topped by the same per-query
  * window rank as [[Similarity.bruteForceTopK]]. The corpus never
  * shuffles.
  *
  * Determinism: hash-seeded init + decimal-accumulated means make the
  * codebook — and so codes, LUTs, and rankings — identical at any
  * parallelism (PqSpec asserts byte-equal output across repartition).
  */
object Pq {

  /** Codebook rows: (sub, code, centroid: array<double>). */
  def trainCodebooks(corpus: DataFrame, vecCol: String, idCol: String,
                     dim: Int, m: Int, ksub: Int,
                     iterations: Int = 2): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    // every training pass (init window + one encode/means per Lloyd
    // step) re-reads the projection; cache it for the build and drop
    // it before returning — the only output is the driver-pinned
    // codebook, so nothing lazy escapes the cache's lifetime. (At
    // full-corpus scale, train on a sample: the codebook needs
    // distribution coverage, not every row.)
    val src = corpus.select(col(idCol).as("id"), col(vecCol).as("v")).cache()
    try {
      // Forgy init: the ksub hash-smallest ROWS seed each subspace's
      // codebook as real data points. (A hash-random PARTITION mean is
      // the wrong init here: every group then averages to ≈ the global
      // mean, the argmax tie-breaks collapse most rows into one code,
      // and Lloyd cannot recover — measured recall@10 0.41 vs 0.97 on
      // the clustered PqSpec fixture.)
      val subs = src
        .select(col("id"), col("v"),
          explode(sequence(lit(0), lit(m - 1))).as("sub"))
        .withColumn("subvec", slice(col("v"), col("sub") * dsub + 1, lit(dsub)))
      val wInit = Window.partitionBy(col("sub"))
        .orderBy(xxhash64(col("id")).asc, col("id").asc)
      var cb = pin(subs
        .withColumn("rn", row_number().over(wInit))
        .filter(col("rn") <= ksub)
        .select(col("sub"), (col("rn") - 1).cast("long").as("code"),
          col("subvec").cast("array<double>").as("centroid")))
      for (_ <- 0 until iterations) {
        val enc = encode(src, cb, "v", "id", dim, m, ksub)
        val assigned = enc
          .select(col("id"), col("v"), posexplode(col("codes")).as(Seq("sub", "code")))
          .withColumn("subvec", slice(col("v"), col("sub") * dsub + 1, lit(dsub)))
        cb = pin(subspaceMeans(assigned))
      }
      cb
    } finally src.unpersist()
  }

  /** Decimal-mean per (sub, code) over exploded subvectors — memory-
    * bounded and order-independent (same shape as IVF's centroidMean).
    */
  private def subspaceMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("sub"), col("code"), posexplode(col("subvec")).as(Seq("dimi", "x")))
      .groupBy(col("sub"), col("code"), col("dimi"))
      .agg((sum(col("x").cast("decimal(28,10)")) / count(lit(1)))
        .cast(DoubleType).as("mu"))
      .groupBy(col("sub"), col("code"))
      .agg(array_sort(collect_list(struct(col("dimi"), col("mu")))).as("dm"))
      .select(col("sub"), col("code"),
        transform(col("dm"), e => e.getField("mu")).as("centroid"))

  private def pin(cb: DataFrame): DataFrame = {
    val spark = cb.sparkSession
    val rows = cb.collect().toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), cb.schema)
  }

  /** Collected codebook: sub → sorted (code, float centroid, ‖c‖²/2). */
  private def collectCb(codebooks: DataFrame): Map[Int, Array[(Int, Array[Float], Double)]] =
    codebooks.select(col("sub").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<float>"))
      .collect()
      .map { r =>
        val c = r.getSeq[Float](2).toArray
        (r.getInt(0), (r.getInt(1), c, c.map(x => x.toDouble * x.toDouble).sum / 2.0))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap

  /** Encode each vector as its m nearest-subcentroid codes — a narrow
    * map: per subspace the L2 argmin is computed as
    * argmax(⟨x_j,c⟩ − ‖c‖²/2) over ksub inlined codegen'd dot kernels
    * (‖x_j‖² is constant per row and cannot change the argmin); ties
    * break to the lowest code. No explode, no shuffle, no UDF.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame,
             vecCol: String, idCol: String,
             dim: Int, m: Int, ksub: Int): DataFrame =
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      codesExpr(codebooks, vecCol, dim, m, ksub).as("codes"))

  /** The codes array as a COLUMN over `vecCol` — composable into any
    * projection (encode, index build) without forcing a re-join. One
    * [[graft.functions.PqEncodeCodes]] kernel call per row: the
    * m·ksub-inlined-kernels alternative generated Janino-hostile
    * methods (~12 s fixed codegen per query) and capped ksub.
    */
  def codesExpr(codebooks: DataFrame, vecCol: String,
                dim: Int, m: Int, ksub: Int): Column =
    codesExprOn(codebooks, col(vecCol), dim, m, ksub)

  /** [[codesExpr]] over an arbitrary vector COLUMN (e.g. a normalized
    * projection) instead of a named input column. */
  def codesExprOn(codebooks: DataFrame, vec: Column,
                  dim: Int, m: Int, ksub: Int): Column = {
    val (flat, halves) = flatCbArrays(codebooks, dim, m, ksub)
    codesOnFlat(flat, halves, vec, dim, m, ksub)
  }

  /** The collected codebook as the kernels' flat arrays — ONE bounded
    * collect + flatten shared by every consumer of the same codebook
    * frame in a plan (encode columns on both join sides, the SDC
    * table): build once, pass to [[codesOnFlat]] / [[sdcTableFromFlat]].
    * Never-trained codes stay zero-vector / +∞-half.
    */
  private[graft] def flatCbArrays(codebooks: DataFrame,
                                  dim: Int, m: Int, ksub: Int): (Array[Float], Array[Double]) = {
    val dsub = dim / m
    val cb = collectCb(codebooks)
    val flat = Array.fill(m * ksub * dsub)(0.0f)
    val halves = Array.fill(m * ksub)(Double.PositiveInfinity)
    for ((sub, codes) <- cb; (code, cvec, half) <- codes) {
      halves(sub * ksub + code) = half
      for (i <- cvec.indices) flat((sub * ksub + code) * dsub + i) = cvec(i)
    }
    (flat, halves)
  }

  /** [[codesExprOn]] over already-flattened codebook arrays — callers
    * encoding several columns against one codebook flatten once; the
    * kernel wrapper's identity-keyed broadcast cache then ships ONE
    * payload block for all of them. */
  private[graft] def codesOnFlat(flat: Array[Float], halves: Array[Double],
                                 vec: Column, dim: Int, m: Int, ksub: Int): Column =
    VectorExpressions.pqEncode(vec, flat, halves, m, ksub, dim / m)

  /** The SDC code-pair table: table[(j·ksub+a)·ksub+b] = ⟨c_ja, c_jb⟩,
    * so Σ_j table[..a_j..b_j] = ⟨decode(a), decode(b)⟩ — the symmetric
    * counterpart of the per-query ADC LUT, built ONCE for any number of
    * queries/pairs (m·ksub² doubles: 16 KB at ksub=16, 4 MB at the
    * production ksub=256). Never-trained codes decode to the zero
    * vector and contribute 0. Broadcast it and score pairs with
    * [[graft.functions.VectorExpressions.pqSdcScore]].
    */
  def sdcTable(codebooks: DataFrame, dim: Int, m: Int, ksub: Int): Array[Double] =
    sdcTableFromFlat(flatCbArrays(codebooks, dim, m, ksub)._1, dim, m, ksub)

  /** [[sdcTable]] over an already-flattened codebook (see
    * [[flatCbArrays]]) — no extra collect. */
  private[graft] def sdcTableFromFlat(flat: Array[Float],
                                      dim: Int, m: Int, ksub: Int): Array[Double] = {
    val dsub = dim / m
    val t = new Array[Double](m * ksub * ksub)
    var j = 0
    while (j < m) {
      var a = 0
      while (a < ksub) {
        var b = 0
        while (b < ksub) {
          var s = 0.0
          var i = 0
          while (i < dsub) {
            s += flat((j * ksub + a) * dsub + i).toDouble *
              flat((j * ksub + b) * dsub + i).toDouble
            i += 1
          }
          t((j * ksub + a) * ksub + b) = s
          b += 1
        }
        a += 1
      }
      j += 1
    }
    t
  }

  /** Reconstruction (decode) of a codes array back to the quantized
    * vector — the test/debug inverse; float centroids so it is exactly
    * what ADC scores against.
    */
  def decode(encoded: DataFrame, codebooks: DataFrame,
             dim: Int, m: Int, ksub: Int): DataFrame = {
    val cb = collectCb(codebooks)
    val flat: Array[Float] = {
      val dsub = dim / m
      val a = Array.fill(m * ksub * dsub)(0.0f)
      for ((sub, codes) <- cb; (code, cvec, _) <- codes; i <- cvec.indices)
        a((sub * ksub + code) * dsub + i) = cvec(i)
      a
    }
    val dsub = dim / m
    val recon = flatten(transform(col("codes"), (c, j) =>
      slice(typedLit(flat), (j * ksub + c) * dsub + lit(1), lit(dsub))))
    encoded.withColumn("recon", recon)
  }

  /** ADC top-k: per query, ONE m×ksub table of exact subspace dot
    * products (computed distributed over queries × codebook rows, both
    * tiny, then broadcast); per corpus row, the approximate score is m
    * positional array lookups summed — inlined builtins, no HOF, no
    * UDF. Ranking/tie-break mirrors [[Similarity.bruteForceTopK]], so
    * recall is measured by [[Similarity.recallAtK]] directly.
    */
  def adcTopK(encoded: DataFrame, codebooks: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              dim: Int, m: Int, ksub: Int,
              excludeSelf: Boolean = true): DataFrame = {
    val dsub = dim / m
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cbRows = codebooks.select(col("sub"), col("code"),
      col("centroid").cast("array<float>").as("cf"))
    val luts = q.crossJoin(broadcast(cbRows))
      .withColumn("slot", (col("sub") * ksub + col("code")).cast("int"))
      .withColumn("d", VectorExpressions.dotF(
        slice(col("qv"), col("sub") * dsub + 1, lit(dsub)), col("cf")))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("d")))).as("lutm"))
      // dense LUT: empty (never-assigned) slots read 0.0 and are never
      // referenced by any real code
      .withColumn("lut", transform(sequence(lit(0), lit(m * ksub - 1)),
        i => coalesce(element_at(col("lutm"), i.cast("int")), lit(0.0))))
      .select(col("query_id"), col("lut"))
    val score = (0 until m)
      .map(j => element_at(col("lut"), col("codes")(j) + (j * ksub + 1)))
      .reduce(_ + _)
    val joined = encoded.crossJoin(broadcast(luts))
    val filtered =
      if (excludeSelf) joined.filter(col("id") =!= col("query_id")) else joined
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("id").asc)
    filtered.withColumn("adc", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("corpus_id"),
        round(col("adc"), 6).as("adc"), col("rank"))
  }

  /** The production PQ pipeline: ADC shortlists `shortlistK` candidates
    * per query from the compressed codes, then ONLY those rows' real
    * vectors are fetched and exactly re-ranked to top-k. At 100 TB the
    * full-precision reads drop from the whole corpus to
    * queries × shortlistK rows; within-shortlist ranking is exact, so
    * ADC quantization noise only matters at the shortlist boundary
    * (PqSpec: re-ranked recall ≥ shortlist recall ≫ raw-ADC recall on
    * near-tie data).
    */
  def adcRerankTopK(encoded: DataFrame, codebooks: DataFrame,
                    queries: DataFrame, corpus: DataFrame,
                    vecCol: String, idCol: String, k: Int, shortlistK: Int,
                    dim: Int, m: Int, ksub: Int,
                    excludeSelf: Boolean = true): DataFrame = {
    val short = adcTopK(encoded, codebooks, queries, vecCol, idCol,
      shortlistK, dim, m, ksub, excludeSelf)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    // shortlist (queries×shortlistK rows) broadcasts into the corpus
    // fetch — the corpus side stays unshuffled
    val fetched = c.join(broadcast(short.join(q, Seq("query_id"))
        .select(col("query_id"), col("corpus_id"), col("qv"))),
      Seq("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    fetched.withColumn("cos", VectorExpressions.cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** L2-normalize a float-vector column (zero vectors pass through), so
    * ADC's inner product ranks by cosine.
    */
  def normalized(v: Column): Column = {
    val n = VectorExpressions.normF(v)
    when(n === 0.0, v).otherwise(
      transform(v, x => (x.cast(DoubleType) / n).cast("float")))
  }

  // ---------------------------------------------------------------------
  // IVF-PQ: PQ over RESIDUALS of a coarse quantizer (Jégou et al. §IV;
  // the FAISS IVFPQ workhorse). Plain PQ's subspace error is sized by
  // the GLOBAL spread; encoding x − c(cell) sizes the codebooks to the
  // LOCAL offsets for the same m bytes per vector. Honest quality
  // model, from the 202k soak on 64 tight clusters (~3.2k members each,
  // an adversarial all-near-ties regime): when the true top-k
  // distinction sits below the 8-byte quantizer's resolution floor, NO
  // flat-PQ ADC ranking recovers it (recall@10 ≈ 0.04–0.08 at
  // shortlist 200, both variants — a tie-break lottery). The operative
  // knob there is SHORTLIST SIZE vs the ambiguity-set size: IVF-PQ's
  // contribution is cutting the candidate pool to the probed cells
  // (~3% here), which is what makes an ambiguity-set-sized shortlist
  // (with exact re-rank over only queries×shortlistK real vectors)
  // affordable — measured recall@10 1.000 at shortlist 4000 over the
  // same corpus. On data with resolvable local structure (PqSpec's
  // fixture), small shortlists already reach ≥ 0.9.
  // ---------------------------------------------------------------------

  /** Assign cells (coarse quantizer), subtract the centroid, and train/
    * encode PQ on the residuals. Returns (codebooks, encoded) where
    * encoded = (id, cell, codes) — the compact index rows to persist,
    * partitioned by cell for probe-time pruning.
    */
  def ivfPqIndex(corpus: DataFrame, centroids: DataFrame,
                 vecCol: String, idCol: String,
                 dim: Int, m: Int, ksub: Int,
                 iterations: Int = 2): (DataFrame, DataFrame) = {
    val assigned = Similarity.assignCells(corpus, centroids, vecCol, idCol)
    val cents = centroids.select(col("cell"),
      col("centroid").cast("array<float>").as("__cf"))
    // cached: training re-reads the residuals per Lloyd pass and the
    // final encode reads them once more. The returned `encoded` frame
    // is lazy OVER this cache — persist it (partitioned by cell) and
    // the cache becomes collectable
    val residuals = assigned.join(broadcast(cents), Seq("cell"))
      .withColumn("rv", zip_with(col("cv"), col("__cf"),
        (x, c) => (x.cast(DoubleType) - c.cast(DoubleType)).cast("float")))
      .select(col("corpus_id"), col("cell"), col("rv"))
      .cache()
    val cb = trainCodebooks(residuals, "rv", "corpus_id", dim, m, ksub, iterations)
    val enc = residuals.select(col("corpus_id").as("id"), col("cell"),
      codesExpr(cb, "rv", dim, m, ksub).as("codes"))
    (cb, enc)
  }

  /** IVF-PQ search: probe the `nProbe` nearest cells per query; score
    * candidates as ⟨q,x⟩ ≈ ⟨q,c(cell)⟩ + ⟨q,residual⟩ — the first term
    * is one broadcast scalar per (query, probed cell), the second the
    * usual ADC LUT sum over the residual codes. The candidate scan
    * touches only probed cells (partition-prunable when `encoded` is
    * stored partitioned by cell) and never reads full vectors.
    */
  def ivfPqTopK(encoded: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                queries: DataFrame, vecCol: String, idCol: String,
                k: Int, nProbe: Int,
                dim: Int, m: Int, ksub: Int,
                excludeSelf: Boolean = true): DataFrame = {
    val dsub = dim / m
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // probed cells + the per-cell coarse term ⟨q, c⟩, selected by ONE
    // narrow top-nProbe kernel over the RAW centroid matrix
    // (NearestCellsTopK returns the true dot, bit-identical to the
    // dotF kernel the old crossJoin+window form computed — and skips
    // materializing + shuffling nQueries×nCells rows)
    val (flat, cellIds, cdim) =
      Similarity.flatCentroids(centroids, normalize = false)
    val probes = q.withColumn("pc", explode(VectorExpressions.nearestCellsTopK(
        col("qv"), flat, cellIds, cdim, nProbe)))
      .select(col("query_id"), col("qv"),
        col("pc.cell").as("cell"), col("pc.d").as("qdotc"))
    // residual LUTs (shared codebooks across cells)
    val cbRows = codebooks.select(col("sub"), col("code"),
      col("centroid").cast("array<float>").as("ccf"))
    val luts = q.crossJoin(broadcast(cbRows))
      .withColumn("slot", (col("sub") * ksub + col("code")).cast("int"))
      .withColumn("d", VectorExpressions.dotF(
        slice(col("qv"), col("sub") * dsub + 1, lit(dsub)), col("ccf")))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("d")))).as("lutm"))
      .withColumn("lut", transform(sequence(lit(0), lit(m * ksub - 1)),
        i => coalesce(element_at(col("lutm"), i.cast("int")), lit(0.0))))
      .select(col("query_id"), col("lut"))
    val probeSide = probes.join(luts, Seq("query_id"))
      .select(col("query_id"), col("cell"), col("qdotc"), col("lut"))
    val adc = (0 until m)
      .map(j => element_at(col("lut"), col("codes")(j) + (j * ksub + 1)))
      .reduce(_ + _)
    val cands = encoded.join(broadcast(probeSide), Seq("cell"))
    val filtered =
      if (excludeSelf) cands.filter(col("id") =!= col("query_id")) else cands
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    filtered.withColumn("score", col("qdotc") + adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("corpus_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** IVF-PQ with exact re-ranking: shortlist via [[ivfPqTopK]], fetch
    * only the shortlist's real vectors, re-rank exactly — the full
    * production read path (coarse probe → compressed scan → exact
    * top-k on queries × shortlistK rows).
    */
  def ivfPqRerankTopK(encoded: DataFrame, centroids: DataFrame,
                      codebooks: DataFrame, queries: DataFrame,
                      corpus: DataFrame, vecCol: String, idCol: String,
                      k: Int, shortlistK: Int, nProbe: Int,
                      dim: Int, m: Int, ksub: Int,
                      excludeSelf: Boolean = true): DataFrame = {
    val short = ivfPqTopK(encoded, centroids, codebooks, queries, vecCol,
      idCol, shortlistK, nProbe, dim, m, ksub, excludeSelf)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val fetched = c.join(broadcast(short.join(q, Seq("query_id"))
        .select(col("query_id"), col("corpus_id"), col("qv"))),
      Seq("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    fetched.withColumn("cos", VectorExpressions.cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** IVF top-k with PQ pre-ranking for the ALL-CORPUS query-batch shape
    * ([[Similarity.ivfTopK]]'s drop-in when queries ≈ corpus — the
    * embedding near-dup / hard-negative-mining self-join at scale).
    * [[Similarity.ivfTopK]] exact-scores EVERY probed candidate with
    * the full-dimension cosine kernel (dim multiply-adds per pair —
    * the measured wall at 100×); here candidates are ranked first by
    * the SYMMETRIC PQ score (m table reads per pair against one shared
    * broadcast [[sdcTable]] — per-query ADC LUTs are ruled out in this
    * shape: a corpus-sized query batch would broadcast a corpus-sized
    * LUT set), and only the top-`preRankC` per query are fetched and
    * exactly re-ranked to top-k. Approximate at the pre-rank boundary
    * only (gated: x_ann_pq_prerank_recall); within the shortlist the
    * ranking is exact cosine, ties to the lower corpus_id, same output
    * schema as ivfTopK.
    *
    * Ranking statistic: ⟨q̂_codes, ĉ_codes⟩ / ‖decode(c_codes)‖ — the
    * reconstruction COSINE up to the per-query constant ‖decode(q)‖,
    * which cannot change a per-query ranking. Dividing by the corpus-
    * side reconstruction norm matters: raw SDC dots are shrunk by each
    * side's quantization energy loss, which varies per row — a rowwise
    * bias that would mis-rank across candidates. A zero-norm
    * reconstruction (degenerate input) ranks LAST (−∞), never NaN.
    *
    * Scale shape: codes + norms are narrow maps; the candidate join is
    * the same broadcast-probe equi-join as ivfTopK with the heavy
    * per-candidate cosine replaced by m reads; the pre-rank window
    * shuffles only (query_id, corpus_id, score) triples (Spark 4
    * inserts WindowGroupLimit below the exchange — partial top-k
    * map-side); the exact fetch re-joins only nQueries×preRankC ids.
    * `codebooks` must be trained on L2-NORMALIZED vectors (encoding
    * normalizes internally to match).
    */
  def ivfSdcPrerankTopK(assigned: DataFrame, centroids: DataFrame,
                        codebooks: DataFrame, queries: DataFrame,
                        vecCol: String, idCol: String, k: Int, nProbe: Int,
                        preRankC: Int, dim: Int, m: Int, ksub: Int): DataFrame = {
    require(preRankC >= k, s"ivfSdcPrerankTopK: preRankC $preRankC < k $k")
    // ONE bounded codebook collect feeds everything: the SDC pair
    // table AND both encode columns (corpus + query side), which the
    // kernel wrapper's broadcast cache then ships as ONE payload block
    val (cbFlat, cbHalves) = flatCbArrays(codebooks, dim, m, ksub)
    val tblArr = sdcTableFromFlat(cbFlat, dim, m, ksub)
    val (units, cellIds, cdim) =
      Similarity.flatCentroids(centroids, normalize = true)
    // corpus side: codes + reconstruction norm, both narrow maps over
    // the (already cell-partitioned) index — in production these two
    // columns persist WITH the index ([[writePqIndex]] /
    // [[ivfSdcPrerankTopKFromStore]]), amortized over every query batch
    val encC = pqIndexColumns(assigned, cbFlat, cbHalves, tblArr, dim, m, ksub)
      .select(col("corpus_id"), col("cell"), col("codes"), col("cnorm"))
    sdcPrerankFrom(encC, assigned.select(col("corpus_id"), col("cv")),
      units, cellIds, cdim, queries, vecCol, idCol, cbFlat, cbHalves, tblArr,
      k, nProbe, preRankC, dim, m, ksub,
      // in-memory index partitioning is arbitrary — one compact
      // repartition of the (id, cell, codes, norm) frame bounds the
      // fused operator's per-partition heap table by cell locality
      clusterCorpusByCell = true)
  }

  /** `assigned` (corpus_id, cv, cell) + the two persisted-index
    * columns: PQ `codes` (encoded from the NORMALIZED vector) and
    * `cnorm`, the SDC reconstruction norm. The one place the
    * stored-index column convention lives — [[ivfSdcPrerankTopK]]
    * computes them on the fly; [[writePqIndex]] persists them.
    */
  private def pqIndexColumns(assigned: DataFrame, cbFlat: Array[Float],
                             cbHalves: Array[Double], tblArr: Array[Double],
                             dim: Int, m: Int, ksub: Int): DataFrame =
    assigned
      .withColumn("codes",
        codesOnFlat(cbFlat, cbHalves, normalized(col("cv")), dim, m, ksub))
      .withColumn("cnorm", sqrt(
        VectorExpressions.pqSdcScore(col("codes"), col("codes"), tblArr, m, ksub)))

  /** The shared SDC-prerank query flow over an already-encoded corpus
    * side — `encC` is (corpus_id, cell, codes, cnorm), `corpusVecs` is
    * (corpus_id, cv) for the exact re-rank fetch. Both callers (the
    * on-the-fly [[ivfSdcPrerankTopK]] and the store-backed
    * [[ivfSdcPrerankTopKFromStore]]) produce byte-identical output for
    * the same index (spec-pinned).
    */
  private def sdcPrerankFrom(
      encC: DataFrame, corpusVecs: DataFrame,
      units: Array[Float], cellIds: Array[Long], cdim: Int,
      queries: DataFrame,
      vecCol: String, idCol: String,
      cbFlat: Array[Float], cbHalves: Array[Double], tblArr: Array[Double],
      k: Int, nProbe: Int, preRankC: Int,
      dim: Int, m: Int, ksub: Int,
      clusterCorpusByCell: Boolean = false): DataFrame = {
    require(preRankC >= k, s"sdc prerank: preRankC $preRankC < k $k")
    def sdc(a: Column, b: Column) =
      VectorExpressions.pqSdcScore(a, b, tblArr, m, ksub)
    // query side: probe selection (narrow top-nProbe kernel) + codes;
    // qcodes (m ints) ride the probe broadcast — LIGHTER than the qv
    // float vector ivfTopK broadcasts. The flat centroid triple is the
    // CALLER'S — both entry points flatten once, so the store path's
    // eager probed-cells pass and this plan share one broadcast matrix
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val qp = q
      .select(col("query_id"),
        codesOnFlat(cbFlat, cbHalves, normalized(col("qv")), dim, m, ksub)
          .as("qcodes"),
        explode(VectorExpressions.nearestCellsTopK(
          col("qv"), units, cellIds, cdim, nProbe)).as("pc"))
      .select(col("query_id"), col("qcodes"), col("pc.cell").as("cell"))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("corpus_id").asc)
    val corpusSide = encC
      .select(col("corpus_id"), col("cell"), col("codes"), col("cnorm"))
    // pre-rank: the FUSED probe-join + partial-top-k physical operator
    // (plans/SdcTopKPlan.scala) — candidates are scored inline against
    // the broadcast probe side and kept in a bounded per-query heap, so
    // non-surviving candidates are never materialized as rows and
    // nothing is locally sorted; the global window then ranks
    // ≤ partitions × preRankC rows per query instead of every
    // candidate. Bit-identical shortlists to the compositional
    // join+window plan (spec-pinned), which remains as the fallback
    // for exotic (non-long) id layouts. `clusterCorpusByCell` bounds
    // the per-partition heap table for corpus-sized query batches —
    // the store path's cell-directory scan is already clustered.
    val short = if (graft.plans.SdcTopKPlan.layoutSupported(corpusSide, qp)) {
      val clustered =
        if (clusterCorpusByCell) corpusSide.repartition(col("cell"))
        else corpusSide
      graft.plans.SdcTopKPlan
        .partialTopK(clustered, qp,
          VectorExpressions.sdcTableBroadcast(tblArr), m, ksub, preRankC)
        .withColumn("pr", row_number().over(wPre))
        .filter(col("pr") <= preRankC)
        .select(col("query_id"), col("corpus_id"))
    } else {
      val pre = corpusSide.join(broadcast(qp), Seq("cell"))
        .filter(col("corpus_id") =!= col("query_id"))
        .select(col("query_id"), col("corpus_id"),
          when(col("cnorm") > 0, sdc(col("qcodes"), col("codes")) / col("cnorm"))
            .otherwise(lit(Double.NegativeInfinity)).as("ascore"))
      pre.withColumn("pr", row_number().over(wPre))
        .filter(col("pr") <= preRankC)
        .select(col("query_id"), col("corpus_id"))
    }
    // exact re-rank over only the shortlist's real vectors (join
    // strategy left to Catalyst/AQE: shortlist and corpus sizes vary
    // by orders of magnitude across call shapes)
    val fetched = short
      .join(corpusVecs, Seq("corpus_id"))
      .join(q, Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    fetched.withColumn("cos", VectorExpressions.cosineF(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Persist a PQ-augmented IVF index: the assigned corpus
    * (corpus_id, cv) WITH its `codes` + `cnorm` columns, partitioned
    * BY CELL (the [[Similarity.writeAssigned]] layout, so query-time
    * probes partition-prune), plus everything a reader needs under
    * underscore dirs (invisible to a parquet read of the index root):
    * the codebook frame at `_codebooks/`, the CENTROIDS at
    * `_centroids/` (so appends assign against the index's own cells
    * instead of trusting a caller-supplied frame), and the encode
    * shape at `_meta/`. This is the production shape the prerank path
    * assumes: encode work happens ONCE at index-build time and every
    * query batch reads the m-byte codes instead of re-encoding the
    * corpus.
    */
  def writePqIndex(assigned: DataFrame, centroids: DataFrame,
                   codebooks: DataFrame, path: String,
                   dim: Int, m: Int, ksub: Int): Unit = {
    val (cbFlat, cbHalves) = flatCbArrays(codebooks, dim, m, ksub)
    pqIndexColumns(
        assigned.select(col("corpus_id"), col("cv"), col("cell")),
        cbFlat, cbHalves,
        sdcTableFromFlat(cbFlat, dim, m, ksub), dim, m, ksub)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      // a rebuild must replace the WHOLE store: under a session running
      // partitionOverwriteMode=dynamic, Overwrite would keep any cell
      // partition absent from the NEW data — stale codes encoded with
      // the OLD codebook, silently mis-scored against the new SDC
      // table. Pin static on this writer regardless of session config.
      .option("partitionOverwriteMode", "static")
      .partitionBy("cell").parquet(path)
    codebooks.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + "/_codebooks")
    centroids.select(col("cell"), col("centroid"))
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + "/_centroids")
    // the encode shape is part of the index: a reader supplying a
    // different (dim, m, ksub) would mis-read the stored codes (wrong
    // SDC table shape / ArrayIndexOutOfBounds deep in the flatten) —
    // persist it so the store self-describes and the reader validates
    val spark = assigned.sparkSession
    import spark.implicits._
    Seq((dim, m, ksub)).toDF("dim", "m", "ksub")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + "/_meta")
  }

  /** The store's self-described encode shape — ONE reader for every
    * consumer, so the `_meta` layout lives in one place. */
  private def readStoreMeta(spark: org.apache.spark.sql.SparkSession,
                            storePath: String): (Int, Int, Int) = {
    val meta = spark.read.parquet(storePath + "/_meta")
      .select(col("dim").cast("int"), col("m").cast("int"),
        col("ksub").cast("int")).head()
    (meta.getInt(0), meta.getInt(1), meta.getInt(2))
  }

  /** Append a RAW batch (idCol, vecCol) to an existing
    * [[writePqIndex]] store — the daily-ingest shape. Assignment uses
    * the STORE'S persisted centroids and encoding the STORE'S
    * persisted codebooks (never caller-supplied, never retrained —
    * retrained codebooks would make old and new codes incomparable
    * under one SDC table, and foreign centroids would file rows under
    * cells probes don't expect). Both assignment and encode are pure
    * narrow maps over the batch: O(batch) work, no rebuild, no read
    * of existing rows; `_meta` / `_codebooks` / `_centroids` are left
    * untouched. Output of a query against (store + appended batch) is
    * byte-identical to a one-shot [[writePqIndex]] over the union
    * (spec-pinned).
    *
    * RETRY HAZARD: appends are AT-LEAST-ONCE under job retries — a
    * re-run after a committed append duplicates the batch's rows, and
    * a duplicated neighbor occupies two of the top-k ranks. Either
    * make the orchestrator exactly-once, or pass
    * `skipExistingIds = true` to anti-join the batch against the ids
    * already present in its target cells (costs a read of those
    * cells' corpus_id column — partition-pruned, not the full store).
    * `skipExistingIds` covers the exact-retry case ONLY: it assumes
    * ids are IMMUTABLE (a re-ingested id whose vector changed may
    * assign to a DIFFERENT cell, which the cell-pruned check never
    * reads) and appends are SERIALIZED (two concurrent appends of
    * overlapping batches both pass the check before either commits).
    * If either assumption can break, pass `strictIdCheck = true`
    * instead: the anti-join reads corpus_id across the FULL store —
    * an unpruned (single-column, still cheap) scan that catches
    * moved-cell re-ingests too. Concurrent appends remain the
    * orchestrator's problem under either mode.
    * Codebook/centroid drift is the documented trade-off: a shifting
    * ingest distribution degrades quantization/recall — gate with the
    * recall probes and re-train + rewrite when the gate drops.
    */
  def appendToPqIndex(spark: org.apache.spark.sql.SparkSession,
                      storePath: String, batch: DataFrame,
                      vecCol: String, idCol: String,
                      skipExistingIds: Boolean = false,
                      strictIdCheck: Boolean = false): Unit = {
    val (dim, m, ksub) = readStoreMeta(spark, storePath)
    val codebooks = spark.read.parquet(storePath + "/_codebooks")
    val centroids = spark.read.parquet(storePath + "/_centroids")
    val (cbFlat, cbHalves) = flatCbArrays(codebooks, dim, m, ksub)
    val store = spark.read.parquet(storePath)
    // validate the batch's columns against the store BEFORE any derived
    // work or write: a mistyped batch (array<double> vectors into an
    // array<float> store, a string id into a long store) would
    // otherwise either trip an opaque kernel type-check deep in
    // assignment/encode or — worse — commit mixed-schema parquet files
    // that only blow up at the NEXT read, corrupting the index from
    // the reader's perspective. The derived codes/cnorm columns are
    // pure functions of cv, so checking (id, vec) covers the whole
    // written schema. Compare by SQL type (nullability is legitimately
    // loose on parquet read-back); `cell` is the partition column,
    // whose read-back type is inference-dependent, so it is excluded.
    val want = store.schema.filter(f => f.name == "corpus_id" || f.name == "cv")
      .map(f => f.name -> f.dataType.sql).toMap
    val got = Map("corpus_id" -> batch.schema(idCol).dataType.sql,
      "cv" -> batch.schema(vecCol).dataType.sql)
    require(got == want,
      s"appendToPqIndex: batch ($idCol, $vecCol) types $got do not match " +
        s"store $storePath schema $want — appending would corrupt the index")
    val assigned = Similarity.assignCells(batch, centroids, vecCol, idCol)
      .select(col("corpus_id"), col("cv"), col("cell"))
    val deduped = if (!skipExistingIds && !strictIdCheck) assigned else {
      val existing =
        if (strictIdCheck) store.select(col("corpus_id"))
        else {
          val touched = assigned.select(col("cell")).distinct()
            .collect().map(_.getLong(0))
          store.filter(col("cell").isin(touched.toIndexedSeq: _*))
            .select(col("corpus_id"))
        }
      assigned.join(existing, Seq("corpus_id"), "left_anti")
    }
    pqIndexColumns(deduped, cbFlat, cbHalves,
        sdcTableFromFlat(cbFlat, dim, m, ksub), dim, m, ksub)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(storePath)
  }

  /** [[ivfSdcPrerankTopK]] against a [[writePqIndex]] store: the
    * probed cell set is computed first (bounded — queries × centroids)
    * and pushed into the store scan as a static `cell IN (...)`
    * predicate, so partition pruning skips every unprobed cell's files
    * AND the corpus-side encode is skipped entirely (codes/cnorm are
    * read, not recomputed). At 100 TB with nCells=4096 and nProbe=8
    * the scan reads 0.2% of the store, and the per-batch narrow-map
    * cost drops from dim-FMA encode per corpus row to a parquet column
    * read. Output is byte-identical to the in-memory form over the
    * same index (spec-pinned). The explicit-shape form validates the
    * caller's (dim, m, ksub) against `_meta` before any scan; the
    * short overload below reads shape AND centroids from the store —
    * fully self-describing, nothing to mismatch.
    */
  def ivfSdcPrerankTopKFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      centroids: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int,
      preRankC: Int, dim: Int, m: Int, ksub: Int): DataFrame = {
    require(preRankC >= k,
      s"ivfSdcPrerankTopKFromStore: preRankC $preRankC < k $k")
    // reject a caller whose (dim, m, ksub) disagrees with what the
    // codes were written with BEFORE any scan (the failure otherwise
    // is an opaque out-of-bounds deep in the codebook flatten, or
    // silently mis-shaped SDC scores)
    val (sDim, sM, sKsub) = readStoreMeta(spark, storePath)
    require(sDim == dim && sM == m && sKsub == ksub,
      s"ivfSdcPrerankTopKFromStore: store $storePath was written with " +
        s"(dim=$sDim, m=$sM, ksub=$sKsub), " +
        s"caller passed (dim=$dim, m=$m, ksub=$ksub)")
    val codebooks = spark.read.parquet(storePath + "/_codebooks")
    val (cbFlat, cbHalves) = flatCbArrays(codebooks, dim, m, ksub)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // flatten ONCE: this triple feeds the eager probed-cells pass AND
    // the query plan inside sdcPrerankFrom — same array instance, so
    // the identity-keyed broadcast cache ships one matrix block
    val (units, cellIds, cdim) =
      Similarity.flatCentroids(centroids, normalize = true)
    val probedCells = q.select(explode(VectorExpressions.nearestCellsTopK(
        col("qv"), units, cellIds, cdim, nProbe)).as("pc"))
      .select(col("pc.cell")).distinct()
      .collect().map(_.getLong(0))
    val store = spark.read.parquet(storePath)
      .filter(col("cell").isin(probedCells.toIndexedSeq: _*))
    sdcPrerankFrom(
      store.select(col("corpus_id"), col("cell"), col("codes"), col("cnorm")),
      store.select(col("corpus_id"), col("cv")),
      units, cellIds, cdim, queries, vecCol, idCol, cbFlat, cbHalves,
      sdcTableFromFlat(cbFlat, dim, m, ksub),
      k, nProbe, preRankC, dim, m, ksub)
  }

  /** Self-describing overload: shape AND centroids come from the
    * store itself — nothing for a caller to mismatch. */
  def ivfSdcPrerankTopKFromStore(
      spark: org.apache.spark.sql.SparkSession, storePath: String,
      queries: DataFrame, vecCol: String, idCol: String,
      k: Int, nProbe: Int, preRankC: Int): DataFrame = {
    val (dim, m, ksub) = readStoreMeta(spark, storePath)
    ivfSdcPrerankTopKFromStore(spark, storePath,
      spark.read.parquet(storePath + "/_centroids"), queries,
      vecCol, idCol, k, nProbe, preRankC, dim, m, ksub)
  }
}
