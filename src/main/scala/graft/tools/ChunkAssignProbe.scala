package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Scale probe for the chunked (>128-cell) assignCells path: assigns
  * the given embeddings corpus to `nCells` deterministic synthetic
  * centroids, prints wall time, the assignment row count, and the
  * Exchange/Window occurrences in the executed plan (both must be 0 —
  * the path's whole contract is narrow-map at any nCells).
  *
  * usage: runMain graft.tools.ChunkAssignProbe <sfDir> [nCells]
  */
object ChunkAssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 512
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("chunk-assign-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      // deterministic centroids: FNV-keyed pseudo-gaussians, no RNG
      val cents = (0 until nCells).map { c =>
        (c.toLong, (0 until dim).map { d =>
          val h = graft.functions.VectorExpressions.fnv1a64Bytes(
            s"$c:$d".getBytes("UTF-8"))
          (((h % 2000001L) + 2000001L) % 2000001L - 1000000L).toDouble / 1000000.0
        })
      }.toDF("cell", "centroid")
      e.count() // warm page cache
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
      // time an aggregate that REQUIRES the cell column — a bare
      // count() lets the optimizer prune the assignment projection
      // away and times the parquet scan instead of the kernel
      val t0 = System.nanoTime()
      val agg = assigned.agg(count(lit(1)).as("n"),
        countDistinct(col("cell")).as("cells")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = assigned.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).size
      val win = "Window".r.findAllIn(plan).size
      println(f"[chunkassign] dir=$dir nCells=$nCells rows=${agg.getLong(0)} " +
        f"sec=$sec%.2f exchanges=$ex windows=$win distinct_cells=${agg.getLong(1)}")
    } finally spark.stop()
  }
}
