package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Evidence probe for trainedCentroids' Lloyd-polish depth (fixed at
  * lloyd=1 since r13): measures IVF recall@10 and centroid-build wall
  * time at lloyd ∈ {0,1,2,3} against the same exact brute force, at
  * the flagship budget (nCells=16, nProbe as given). Each Lloyd step
  * costs one full-corpus assignment pass + one per-cell mean pass, so
  * depth is a linear cost knob — this probe shows what recall each
  * extra pass buys on the gated data family (run at 10x and 100x
  * replicas; record the table in SCALE.md).
  *
  * usage: runMain graft.tools.LloydDepthProbe <sfDir> [nCells] [nProbe] [nQueries]
  */
object LloydDepthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 16
    val nProbe = if (args.length > 2) args(2).toInt else 8
    val nQ = if (args.length > 3) args(3).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("lloyd-depth-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet").persist()
      val n = e.count()
      val q = e.filter(col("vec_id") < nQ)
      val brute = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        .persist()
      brute.count()
      for (lloyd <- 0 to 3) {
        val t0 = System.nanoTime()
        val cents = Similarity.trainedCentroids(e, "embedding", "vec_id",
          nCells = nCells, lloyd = lloyd)
        cents.count() // trainedCentroids pins; count forces any residue
        val buildSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
        val ivf = Similarity.ivfTopK(assigned, cents, q, "embedding", "vec_id",
          k = 10, nProbe = nProbe)
        val recall = Similarity.recallAtK(ivf, brute)
          .agg(avg("recall")).collect()(0).getDouble(0)
        val querySec = (System.nanoTime() - t1) / 1e9
        println(f"[lloyddepth] dir=$dir n=$n nCells=$nCells nProbe=$nProbe " +
          f"lloyd=$lloyd build_sec=$buildSec%.2f query_sec=$querySec%.2f " +
          f"recall10=$recall%.4f")
      }
    } finally spark.stop()
  }
}
