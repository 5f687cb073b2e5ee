package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** Calibration probe for the pure-PQ ANN recall bound (x_ann_pq_recall):
  * prints mean recall@10 of the ADC-shortlist+rerank path vs exact brute
  * force for several shortlist budgets, per SF dir. Run before choosing a
  * driver-gate threshold; thresholds must be measured, never guessed.
  *
  * usage: runMain graft.tools.PqRecallProbe /root/testdata/sf0.001 [more dirs]
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("pq-recall-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      for (dir <- args) {
        val raw = spark.read.parquet(s"$dir/embeddings.parquet")
        val e = raw.select(col("vec_id").as("id"),
          Pq.normalized(col("embedding")).as("v"))
        val q = e.filter(col("id") < 20)
        val brute = Similarity.bruteForceTopK(
          raw, raw.filter(col("vec_id") < 20), "embedding", "vec_id", k = 10)
        val cb = Pq.trainCodebooks(e, "v", "id", dim = 64, m = 8, ksub = 16,
          iterations = 1)
        val enc = Pq.encode(e, cb, "v", "id", dim = 64, m = 8, ksub = 16)
        val n = raw.count()
        for (shortlist <- Seq(30, 100, 200)) {
          val pq = Pq.adcRerankTopK(enc, cb, q, e, "v", "id",
            k = 10, shortlistK = shortlist, dim = 64, m = 8, ksub = 16)
          val r = Similarity.recallAtK(pq, brute)
            .agg(avg(col("recall"))).head().getDouble(0)
          println(f"[pqprobe] dir=$dir n=$n shortlist=$shortlist mean_recall10=$r%.4f")
        }
      }
    } finally spark.stop()
  }
}
