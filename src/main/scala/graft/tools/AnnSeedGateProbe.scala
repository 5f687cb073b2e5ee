package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** Calibration probe for the trained-seeding recall gates
  * (x_ann_ivf_trained_recall): prints mean recall@10 of the SHIPPING
  * flagship configs — trainedCentroids (sampled k-means|| init +
  * 1 Lloyd) feeding the IVF probe (nProbe=8) and the IVF-PQ residual
  * path (shortlist=200, nProbe=12) — vs exact brute force, per SF dir.
  * Gate thresholds must be measured, never guessed.
  *
  * usage: runMain graft.tools.AnnSeedGateProbe /root/testdata/sf0.001 [more]
  */
object AnnSeedGateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("ann-seed-gate-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (dir <- args) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val q = e.filter(col("vec_id") < 20)
        val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        val cents = Similarity.trainedCentroids(e, "embedding", "vec_id", nCells = 16)
        val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
        val ivf = Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
          k = 10, nProbe = 8)
        val rIvf = Similarity.recallAtK(ivf, brute)
          .agg(avg(col("recall"))).head().getDouble(0)
        val en = e.select(col("vec_id").as("id"),
          Pq.normalized(col("embedding")).as("v"))
        val qn = en.filter(col("id") < 20)
        val centsN = Similarity.trainedCentroids(en, "v", "id", nCells = 16)
        val (rcb, enc) = Pq.ivfPqIndex(en, centsN, "v", "id",
          dim = 64, m = 8, ksub = 16, iterations = 1)
        val ivfpq = Pq.ivfPqRerankTopK(enc, centsN, rcb, qn, en,
          "v", "id", k = 10, shortlistK = 200, nProbe = 12,
          dim = 64, m = 8, ksub = 16)
        val rPq = Similarity.recallAtK(ivfpq, brute)
          .agg(avg(col("recall"))).head().getDouble(0)
        println(f"[anngate] dir=$dir trained_ivf_np8=$rIvf%.4f trained_ivfpq_sl200_np12=$rPq%.4f")
      }
    } finally spark.stop()
  }
}
