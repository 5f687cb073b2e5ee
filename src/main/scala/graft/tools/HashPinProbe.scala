package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the content-hash pins for the deterministic rows-only
  * registry rows (x_ann_ivf / x_ann_pq / x_ann_ivfpq /
  * x_compression_ratio). Prints one `PIN <query> <sfBasename> <hash>`
  * line per (query, dir) — paste the values into
  * `ExtQueries.contentHashPins` after any INTENDED change to those
  * paths. Run twice to confirm the hash is stable before pinning.
  *
  * usage: runMain graft.tools.HashPinProbe /root/testdata/sf0.001 [more dirs]
  */
object HashPinProbe {
  private val pinned =
    Seq("x_ann_ivf", "x_ann_pq", "x_ann_ivfpq", "x_compression_ratio")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("hash-pin-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try
      for (dir <- args) {
        for (q <- pinned) {
          val h = graft.registry.ExtQueries.contentHash64(
            graft.registry.ExtQueries.queries(q)(spark, dir))
          println(s"PIN $q ${new java.io.File(dir).getName} ${h}L")
        }
        // xlsx byte pin (ExtQueries.xlsxBytePins): hash of the PACKAGE
        // bytes, printed from the same artifact the x_xlsx_hash row
        // writes — both writes shown so a non-deterministic writer is
        // visible right here
        val (p1, p2, logical) = graft.registry.ExtQueries.xlsxArtifactHash(spark, dir)
        println(s"PIN x_xlsx_artifact ${new java.io.File(dir).getName} ${logical}L " +
          s"(logical; package bytes ${p1}L / ${p2}L ${if (p1 == p2) "agree" else "DISAGREE"})")
      }
    finally spark.stop()
  }
}
