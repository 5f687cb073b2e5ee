package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** A/B probe for flipping the IVF-family flagship rows to trained
  * k-means|| seeding (round-13 verdict #1): per SF dir, times the FULL
  * x_ann_ivf / x_ann_ivfpq row shapes (index build + probe + collect)
  * under (a) hash seeding (the r12 flagship), (b) trained rounds=2 no
  * Lloyd, (c) trained rounds=2 + 1 Lloyd (the trainedCentroids
  * default), and prints recall@10 vs brute force at the row's actual
  * probe budget. Decisions about the default must be measured, never
  * guessed.
  *
  * usage: runMain graft.tools.AnnSeedProbe /root/testdata/sf0.01 [more]
  */
object AnnSeedProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("ann-seed-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      for (dir <- args) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val q = e.filter(col("vec_id") < 5)
        val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        brute.count() // warm page cache once, outside the timings

        def ivfRow(cents: => DataFrame): (Double, Double) = {
          val (res, t) = timed {
            val c = Similarity.materializeCentroids(cents)
            val assigned = Similarity.assignCells(e, c, "embedding", "vec_id")
            val out = Similarity.ivfTopK(assigned, c, q,
              "embedding", "vec_id", k = 10, nProbe = 4)
            out.orderBy("query_id", "rank").collect()
            out
          }
          val rec = Similarity.recallAtK(res, brute)
            .agg(avg(col("recall"))).head().getDouble(0)
          (t, rec)
        }
        val ivfVariants = Seq(
          "ivf_hash" -> (() => ivfRow(
            Similarity.coarseCentroids(e, "embedding", "vec_id", nCells = 16))),
          "ivf_trained_l0" -> (() => ivfRow(
            Similarity.trainedCentroids(e, "embedding", "vec_id", nCells = 16, lloyd = 0))),
          "ivf_trained_l1" -> (() => ivfRow(
            Similarity.trainedCentroids(e, "embedding", "vec_id", nCells = 16))))
        for ((name, run) <- ivfVariants) {
          val (t, rec) = run()
          println(f"[annseed] dir=$dir variant=$name sec=$t%.2f recall10=$rec%.4f")
        }

        val en = e.select(col("vec_id").as("id"),
          Pq.normalized(col("embedding")).as("v"))
        val qn = en.filter(col("id") < 5)
        def ivfpqRow(cents: => DataFrame): (Double, Double) = {
          val (res, t) = timed {
            val c = Similarity.materializeCentroids(cents)
            val (rcb, enc) = Pq.ivfPqIndex(en, c, "v", "id",
              dim = 64, m = 8, ksub = 16, iterations = 1)
            val out = Pq.ivfPqRerankTopK(enc, c, rcb, qn, en,
              "v", "id", k = 10, shortlistK = 30, nProbe = 4,
              dim = 64, m = 8, ksub = 16)
            out.orderBy("query_id", "rank").collect()
            out
          }
          val rec = Similarity.recallAtK(res, brute)
            .agg(avg(col("recall"))).head().getDouble(0)
          (t, rec)
        }
        val pqVariants = Seq(
          "ivfpq_hash_l1" -> (() => ivfpqRow(
            Similarity.refineCentroids(en,
              Similarity.coarseCentroids(en, "v", "id", nCells = 16),
              "v", "id", iterations = 1))),
          "ivfpq_trained_l0" -> (() => ivfpqRow(
            Similarity.trainedCentroids(en, "v", "id", nCells = 16, lloyd = 0))),
          "ivfpq_trained_l1" -> (() => ivfpqRow(
            Similarity.trainedCentroids(en, "v", "id", nCells = 16))))
        for ((name, run) <- pqVariants) {
          val (t, rec) = run()
          println(f"[annseed] dir=$dir variant=$name sec=$t%.2f recall10=$rec%.4f")
        }
      }
    } finally spark.stop()
  }
}
