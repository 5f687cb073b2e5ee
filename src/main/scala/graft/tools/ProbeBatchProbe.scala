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
  * With a 5th arg preRankC > 0 the query path is
  * [[graft.ext.Pq.ivfSdcPrerankTopK]] instead of the exact-scored
  * ivfTopK: candidates rank by the symmetric PQ table (m reads/pair,
  * m=16/ksub=16 trained on the normalized corpus) and only the
  * top-preRankC per query get exact cosine — the r14 all-corpus
  * cost-cut this probe exists to measure.
  *
  * A 6th arg `store` (requires preRankC > 0) measures the PERSISTED
  * index path instead: [[graft.ext.Pq.writePqIndex]] runs untimed
  * (index-build work, amortized), then the timed query is
  * [[graft.ext.Pq.ivfSdcPrerankTopKFromStore]] — codes/cnorm read
  * from the cell-partitioned store, zero corpus-side encode in the
  * query path.
  *
  * usage: runMain graft.tools.ProbeBatchProbe <sfDir> [nCells] [nProbe] [k] [preRankC] [store]
  */
object ProbeBatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 256
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 5
    val preRankC = if (args.length > 4) args(4).toInt else 0
    val useStore = args.length > 5 && args(5) == "store"
    // one path val shared by setup and the finally-cleanup; /dev/shm
    // (RAM-backed, what the probe wants) exists only on Linux — fall
    // back to the JVM tmpdir elsewhere. NOTE a large SF dir can exhaust
    // tmpfs: size the store against the box before running store mode.
    val shm = new java.io.File("/dev/shm")
    val storeRoot = if (shm.isDirectory) shm.getPath
      else System.getProperty("java.io.tmpdir")
    val storeDir = new java.io.File(storeRoot,
      s"graft-pqidx-${java.lang.ProcessHandle.current().pid()}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("probe-batch-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_THRESHOLD forces the fused operator's mode for
    // paired A/B runs: "-1" = always partitioned, large = always
    // broadcast (see SdcTopKPlan.probeBroadcastThresholdKey)
    sys.env.get("SPARK_GRAFT_PROBE_THRESHOLD").foreach(v =>
      spark.conf.set(graft.plans.SdcTopKPlan.probeBroadcastThresholdKey, v))
    // SPARK_GRAFT_PROBE_DIM synthesizes a higher-dim embedding column
    // by tiling the real 64-dim vector with small deterministic
    // per-copy jitter — cluster structure (and so cell occupancy)
    // survives, only the arithmetic width changes. This measures the
    // exact-vs-prerank crossover curve at dim 256/768.
    val dimT = sys.env.get("SPARK_GRAFT_PROBE_DIM").map(_.toInt).getOrElse(64)
    require(dimT % 64 == 0, s"probe dim must be a multiple of 64, got $dimT")
    try {
      val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      val e = if (dimT == 64) e0 else e0.withColumn("embedding",
        flatten(array((0 until dimT / 64).map(r =>
          transform(col("embedding"), x =>
            (x + (pmod(xxhash64(col("vec_id"), lit(r)), lit(1000))
              .cast("double") / 1e4 - 0.05)).cast("float"))): _*)))
      val n = e.count() // warm cache + size
      val cents = Similarity.trainedCentroids(e, "embedding", "vec_id",
        nCells = nCells)
      val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
        .persist()
      assigned.count() // pin the index; we time the QUERY path
      val cb = if (preRankC > 0) {
        // codebook build is INDEX-time work (amortized over every query
        // batch in production), so it happens before the timer
        val en = e.select(col("vec_id").as("id"),
          graft.ext.Pq.normalized(col("embedding")).as("v"))
        Some(graft.ext.Pq.trainCodebooks(en, "v", "id",
          dim = dimT, m = 16, ksub = 16, iterations = 1))
      } else None
      val storePath = if (useStore) {
        require(cb.nonEmpty, "store mode requires preRankC > 0")
        val p = storeDir.getPath
        graft.ext.Pq.writePqIndex(assigned, cents, cb.get, p,
          dim = dimT, m = 16, ksub = 16)
        Some(p)
      } else None
      val t0 = System.nanoTime()
      val top = (cb, storePath) match {
        case (Some(_), Some(p)) =>
          graft.ext.Pq.ivfSdcPrerankTopKFromStore(spark, p, cents, e,
            "embedding", "vec_id", k = k, nProbe = nProbe, preRankC = preRankC,
            dim = dimT, m = 16, ksub = 16)
        case (Some(c), None) =>
          graft.ext.Pq.ivfSdcPrerankTopK(assigned, cents, c, e,
            "embedding", "vec_id", k = k, nProbe = nProbe, preRankC = preRankC,
            dim = dimT, m = 16, ksub = 16)
        case _ => Similarity.ivfTopK(assigned, cents, e,
          "embedding", "vec_id", k = k, nProbe = nProbe)
      }
      val rows = top.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probebatch] dir=$dir corpus=$n queries=$n nCells=$nCells " +
        f"nProbe=$nProbe k=$k preRankC=$preRankC store=$useStore dim=$dimT " +
        f"result_rows=$rows sec=$sec%.2f " +
        s"(old probe selection would have shuffled ${n * nCells} rows)")
    } finally {
      // clean the RAM-backed index copy even when the timed query
      // throws — a leaked tmpfs parquet copy survives the JVM
      if (useStore)
        org.apache.commons.io.FileUtils.deleteQuietly(storeDir)
      spark.stop()
    }
  }
}
