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
}
