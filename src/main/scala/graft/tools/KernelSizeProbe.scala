package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence probe for the r14 broadcast-kernel change: measures what
  * actually rides the serialized expression tree (= every task binary)
  * for NearestCell / NearestCellsTopK / PqEncodeCodes at a production
  * index shape, vs the payload the pre-r14 form embedded (the flat
  * matrix itself). Also times an assignment pass at the probed shape to
  * show the kernel itself is unaffected by the swap.
  *
  * usage: runMain graft.tools.KernelSizeProbe [nCells] [dim] [nRows]
  */
object KernelSizeProbe {
  def main(args: Array[String]): Unit = {
    val nCells = if (args.length > 0) args(0).toInt else 4096
    val dim = if (args.length > 1) args(1).toInt else 512
    val nRows = if (args.length > 2) args(2).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("kernel-size-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val units = Array.tabulate(nCells * dim)(i => ((i % 97) - 48) / 48.0f)
      val cells = Array.tabulate(nCells)(_.toLong)
      val matrixBytes = units.length.toLong * 4 + cells.length.toLong * 8
      val ser = SparkEnv.get.closureSerializer.newInstance()
      def exprBytes(c: org.apache.spark.sql.Column): Long =
        ser.serialize(GraftBridge.expression(c)).remaining().toLong
      val assignSz = exprBytes(graft.functions.VectorExpressions
        .nearestCell(col("v"), units, cells, dim))
      val probeSz = exprBytes(graft.functions.VectorExpressions
        .nearestCellsTopK(col("v"), units, cells, dim, 8))
      // PQ codebook at the production m=16/ksub=256 shape for this dim
      val m = 16; val ksub = 256; val dsub = dim / m
      val cbFlat = Array.tabulate(m * ksub * dsub)(i => ((i % 89) - 44) / 44.0f)
      val halves = Array.fill(m * ksub)(0.5)
      val pqSz = exprBytes(graft.functions.VectorExpressions
        .pqEncode(col("v"), cbFlat, halves, m, ksub, dsub))
      val pqBytes = cbFlat.length.toLong * 4 + halves.length.toLong * 8
      println(f"[kernelsize] nCells=$nCells dim=$dim matrix_payload=${matrixBytes / 1048576.0}%.1fMB " +
        f"nearest_cell_expr=${assignSz}B nearest_cells_topk_expr=${probeSz}B " +
        f"(pre-r14: expr carried the full payload into EVERY task binary)")
      println(f"[kernelsize] pq m=$m ksub=$ksub dsub=$dsub codebook_payload=${pqBytes / 1048576.0}%.1fMB " +
        f"pq_encode_expr=${pqSz}B")
      // Aho-Corasick dictionary at a production blocklist shape: the
      // expression must serialize to a handle, not the phrase list
      val nPhrases = 100000
      val dict = Array.tabulate(nPhrases)(i => s"phrase-token-$i-${i * 31}")
      val dictBytes = dict.map(_.length.toLong + 40).sum
      val acSz = exprBytes(graft.functions.MultiPattern.acMatches(col("t"), dict.toSeq))
      println(f"[kernelsize] ac_matches nPhrases=$nPhrases dict_payload=${dictBytes / 1048576.0}%.1fMB " +
        f"ac_expr=${acSz}B (dictionary rides a broadcast; automaton built once per executor)")
      // functional pass at the probed shape: a narrow assignment map
      val rnd = new scala.util.Random(5)
      val corpus = (0 until nRows).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))).toDF("id", "v")
        .repartition(32).persist()
      corpus.count()
      val t0 = System.nanoTime()
      val cnt = corpus.select(graft.functions.VectorExpressions
          .nearestCell(col("v"), units, cells, dim).as("cell"))
        .groupBy("cell").count().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kernelsize] assign $nRows rows x $nCells cells x $dim dims: " +
        f"$sec%.2fs distinct_cells=$cnt")
    } finally spark.stop()
  }
}
