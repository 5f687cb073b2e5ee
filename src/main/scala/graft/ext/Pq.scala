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
    // Forgy init: the ksub hash-smallest ROWS seed each subspace's
    // codebook as real data points. (A hash-random PARTITION mean is
    // the wrong init here: every group then averages to ≈ the global
    // mean, the argmax tie-breaks collapse most rows into one code,
    // and Lloyd cannot recover — measured recall@10 0.41 vs 0.97 on
    // the clustered PqSpec fixture.)
    val subs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
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
      val enc = encode(corpus, cb, vecCol, idCol, dim, m, ksub)
      val assigned = enc
        .select(col("id"), col("v"), posexplode(col("codes")).as(Seq("sub", "code")))
        .withColumn("subvec", slice(col("v"), col("sub") * dsub + 1, lit(dsub)))
      cb = pin(subspaceMeans(assigned))
    }
    cb
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
             dim: Int, m: Int, ksub: Int): DataFrame = {
    require(m.toLong * ksub <= 4096, "inline encode form: m*ksub too large")
    val dsub = dim / m
    val cb = collectCb(codebooks)
    val codeExprs = (0 until m).map { j =>
      val sv = slice(col(vecCol), j * dsub + 1, dsub)
      cb.getOrElse(j, Array.empty) match {
        case Array() => lit(0)
        case Array((only, _, _)) => lit(only)
        case codes =>
          val scored = codes.map { case (code, cvec, half) =>
            struct(
              (VectorExpressions.dotF(sv, typedLit(cvec)) - lit(half)).as("s"),
              lit(-code).as("negcode"))
          }
          (-greatest(scored.toIndexedSeq: _*).getField("negcode")).cast("int")
      }
    }
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      array(codeExprs.toIndexedSeq: _*).as("codes"))
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
}
