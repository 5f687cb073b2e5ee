package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, Sq}

class SqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
    (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),          // zero vector
    (2L, Array(-2.0f, 1.0f, 0.5f, -0.25f)),
    (3L, Array(0.001f, 0.0005f, -0.00025f, 0.0f)) // tiny magnitudes
  ).toDF("vec_id", "embedding")

  test("quantize: hand-computed codes, scale, and the ±127 max element") {
    val got = Sq.quantize(vecs, "embedding", "vec_id")
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2)))
    // id 0: maxabs 1.0, scale 1/127; codes round(x*127): [127, -64(*), 32, 0]
    //   (*) -0.5*127 = -63.5 rounds away from zero -> -64
    assert(got(0)._2 == 1.0 / 127.0)
    assert(got(0)._3 == Seq(127, -64, 32, 0))
    // zero vector: scale 0, all-zero codes
    assert(got(1)._2 == 0.0 && got(1)._3 == Seq(0, 0, 0, 0))
    // id 2: maxabs 2.0 -> the max-magnitude element hits exactly -127
    assert(got(2)._3.head == -127)
    // id 3: tiny scale still maps its own max to 127
    assert(got(3)._3.head == 127)
  }

  test("reconstruction error is bounded by scale/2 for every element") {
    val bad = Sq.quantize(vecs, "embedding", "vec_id", keepVec = true)
      .select(array_max(zip_with(col("embedding"), col("codes"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("scale"))))
        .as("err"), col("scale"))
      .filter(col("err") > col("scale") * 0.5 + lit(1e-12))
    assert(bad.count() == 0)
  }

  test("dequantize round-trips under the original name as array<float>") {
    val recon = Sq.dequantize(
      Sq.quantize(vecs, "embedding", "vec_id"), "embedding", "vec_id")
    assert(recon.columns.toSeq == Seq("vec_id", "embedding"))
    assert(recon.schema("embedding").dataType.simpleString == "array<float>")
    val r0 = recon.filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    // 1.0 is the max element -> reconstructs exactly; others within scale/2
    assert(r0(0) == 1.0f)
    assert(math.abs(r0(1) + 0.5f) <= 1.0 / 127.0 / 2 + 1e-6)
  }

  test("sqTopK never crosses separated clusters; high recall on spread vectors") {
    // Two tight clusters: within a cluster every candidate is a
    // near-tie, so SQ8's ~scale/2 error may legitimately reorder the
    // top-k INSIDE the cluster — the contract is that it never
    // confuses the clusters themselves.
    val rnd = new scala.util.Random(3)
    def jitter(base: Array[Float]) =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f)
    val a = Array.fill(8)(1.0f) ++ Array.fill(8)(0.0f)
    val b = Array.fill(8)(0.0f) ++ Array.fill(8)(1.0f)
    val corpus = ((0 until 20).map(i => (i.toLong, jitter(a))) ++
      (20 until 40).map(i => (i.toLong, jitter(b)))).toDF("vec_id", "embedding")
    val enc = Sq.quantize(corpus, "embedding", "vec_id")
    val sq = Sq.sqTopK(enc, corpus.filter(col("vec_id").isin(0L, 20L)),
      "embedding", "vec_id", k = 5)
    val crossed = sq.filter(
      (col("query_id") === 0 && col("corpus_id") >= 20) ||
        (col("query_id") === 20 && col("corpus_id") < 20)).count()
    assert(crossed == 0)

    // Spread random vectors (the realistic regime): cosine gaps
    // between ranks dwarf the quantization error -> recall ~1
    val spread = (0 until 60)
      .map(i => (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
      .toDF("vec_id", "embedding")
    val q = spread.filter(col("vec_id") < 5)
    val rec = Similarity.recallAtK(
        Sq.sqTopK(Sq.quantize(spread, "embedding", "vec_id"), q,
          "embedding", "vec_id", k = 5),
        Similarity.bruteForceTopK(spread, q, "embedding", "vec_id", k = 5))
      .agg(avg(col("recall"))).as[Double].head()
    assert(rec >= 0.9, s"SQ8 recall on spread vectors was $rec")
  }

  test("randomized: error bound and full-range codes hold on 200 vectors") {
    val rnd = new scala.util.Random(17)
    val many = (0 until 200).map { i =>
      val scale = math.pow(10, rnd.nextInt(7) - 3).toFloat // 1e-3 .. 1e3
      (i.toLong, Array.fill(32)((rnd.nextFloat() - 0.5f) * 2f * scale))
    }.toDF("vec_id", "embedding")
    val enc = Sq.quantize(many, "embedding", "vec_id", keepVec = true)
    val bad = enc.select(
        array_max(zip_with(col("embedding"), col("codes"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("scale"))))
          .as("err"),
        array_max(transform(col("codes"), c => abs(c))).as("mc"),
        col("scale"))
      .filter(col("err") > col("scale") * 0.5 + lit(1e-12) ||
        col("mc") > 127 || (col("scale") > 0 && col("mc") =!= 127))
    // every nonzero vector's max element must map to exactly +-127
    assert(bad.count() == 0)
  }

  test("non-finite elements null the whole encoding instead of silent garbage") {
    val weird = Seq(
      (0L, Array(1.0f, Float.NaN, 0.5f, 0.0f)),
      (1L, Array(Float.PositiveInfinity, 1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, -0.5f, 0.25f, 0.0f)) // finite neighbor unaffected
    ).toDF("vec_id", "embedding")
    val got = Sq.quantize(weird, "embedding", "vec_id").orderBy("vec_id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
    assert(!got(2).isNullAt(1) && got(2).getSeq[Int](2) == Seq(127, -64, 32, 0))
  }

  test("quantize is byte-identical under repartitioning") {
    val a = Sq.quantize(vecs.repartition(5), "embedding", "vec_id")
      .orderBy("vec_id").collect().toSeq
    val b = Sq.quantize(vecs, "embedding", "vec_id")
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
