package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}
import graft.functions.VectorExpressions

/** One-off diagnostic: what does Catalyst's sizeInBytes estimate say
  * for the probe-side frames the fused operator's mode selection reads
  * (`SdcTopKPlan.choosePartitioned`)? A wildly inflated estimate on an
  * explode-bearing probe plan would silently flip gate-scale rows from
  * broadcast to partitioned.
  *
  * usage: runMain graft.tools.StatsPeek <sfDir>
  */
object StatsPeek {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .appName("stats-peek").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val cents = Similarity.refineCentroids(e,
      Similarity.coarseCentroids(e, "v", "id", nCells = 16),
      "v", "id", iterations = 1)
    val (units, cellIds, cdim) = Similarity.flatCentroids(cents, normalize = true)
    val probes = e.select(col("id").as("query_id"), col("v").as("qv"))
      .withColumn("pc", explode(VectorExpressions.nearestCellsTopK(
        col("qv"), units, cellIds, cdim, 4)))
      .select(col("query_id"), col("qv"), col("pc.cell").as("cell"))
    val nRows = e.count()
    val est = probes.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[statspeek] corpus=$nRows probe sizeInBytes estimate=$est " +
      s"(${est / (1L << 20)} MiB) threshold=${512L << 20} " +
      s"partitioned=${est > BigInt(512L << 20)}")
    // the pair-scan fan-out (embeddingNearDupsBucketed probe side)
    val assignedFan = e.withColumn("pc", explode(
        VectorExpressions.nearestCellsTopK(col("v"), units, cellIds, cdim, 2)))
      .select(col("id").as("query_id"), col("v").as("qv"), col("pc.cell").as("cell"))
    val est2 = assignedFan.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[statspeek] pair fan-out estimate=$est2 (${est2 / (1L << 20)} MiB)")
    spark.stop()
  }
}
