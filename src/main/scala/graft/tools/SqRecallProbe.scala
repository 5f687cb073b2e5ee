package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, Sq}

/** Calibration probe for the SQ8 recall bound (x_sq_recall): prints
  * mean recall@10 of exact search over reconstructed int8 vectors vs
  * full-precision brute force, per SF dir. Thresholds must be
  * measured, never guessed (same rule as [[PqRecallProbe]]).
  *
  * usage: runMain graft.tools.SqRecallProbe /root/testdata/sf0.001 [more dirs]
  */
object SqRecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("sq-recall-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      for (dir <- args) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        val q = e.filter(col("vec_id") < 20)
        val enc = Sq.quantize(e, "embedding", "vec_id")
        val sq = Sq.sqTopK(enc, q, "embedding", "vec_id", k = 10)
        val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        val r = Similarity.recallAtK(sq, brute)
          .agg(avg(col("recall"))).head().getDouble(0)
        println(f"[sqprobe] dir=$dir n=${e.count()} mean_recall10=$r%.4f")
      }
    } finally spark.stop()
  }
}
