package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Pq, Similarity}

/** Budget-measurement probe for the PQ-SDC pre-ranked ANN paths — run
  * at all three SFs BEFORE pinning x_ann_pq_prerank_recall's bounds
  * (the same protocol as tools/PqRecallProbe for the ADC bounds):
  * prints mean recall@10 of ivfSdcPrerankTopK vs the exact-scored
  * ivfTopK at several preRankC budgets, and recall / false-positive
  * counts of embeddingNearDupsBucketedPq vs the exact all-pairs
  * operator at several margins.
  *
  * usage: runMain graft.tools.SdcPrerankProbe <sfDir>
  */
object SdcPrerankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("sdc-prerank-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = raw.count()
      val en = raw.select(col("vec_id").as("id"),
        Pq.normalized(col("embedding")).as("v"))
      val cents = Similarity.refineCentroids(en,
        Similarity.coarseCentroids(en, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      val assigned = Similarity.assignCells(en, cents, "v", "id").persist()
      assigned.count()
      val q = en.filter(col("id") < 20)
      val cb = Pq.trainCodebooks(en, "v", "id",
        dim = 64, m = 16, ksub = 16, iterations = 1)
      val exact = Similarity.ivfTopK(assigned, cents, q, "v", "id",
        k = 10, nProbe = 4).persist()
      exact.count()
      for (c <- Seq(200, 300, 400)) {
        val pre = Pq.ivfSdcPrerankTopK(assigned, cents, cb, q, "v", "id",
          k = 10, nProbe = 4, preRankC = c, dim = 64, m = 16, ksub = 16)
        val r = Similarity.recallAtK(pre, exact)
          .agg(avg("recall")).collect()(0).getDouble(0)
        println(f"[sdcprerank] dir=$dir n=$n preRankC=$c recall10_vs_ivf=$r%.4f")
      }
      val e = raw
      val exactPairs = Dedup.embeddingNearDups(
          e.filter(col("vec_id") < 300), "embedding", "vec_id", threshold = 0.4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (mg <- Seq(0.1, 0.2, 0.3)) {
        val got = Dedup.embeddingNearDupsBucketedPq(e, "embedding", "vec_id",
            threshold = 0.4, nCells = 16, nProbe = 4, margin = mg, m = 16, ksub = 16)
          .filter(col("id_a") < 300 && col("id_b") < 300)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val inter = got.intersect(exactPairs).size
        val rec = if (exactPairs.isEmpty) 1.0 else inter.toDouble / exactPairs.size
        println(f"[sdcprerank] dir=$dir neardup margin=$mg recall=$rec%.4f " +
          s"fp=${got.size - inter} exact=${exactPairs.size} got=${got.size}")
      }
    } finally spark.stop()
  }
}
