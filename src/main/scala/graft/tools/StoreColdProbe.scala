package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** Honest store-vs-rebuild measurement for the persisted PQ index
  * (SCALE.md future-work #2): the earlier store-mode numbers ran
  * against a RAM-resident corpus on tmpfs with 256 cells — nothing to
  * prune and nothing to read, so the store could only lose. This
  * probe builds the production shape instead:
  *
  *   - the corpus AND the store live on the ROOT DISK (not /dev/shm),
  *   - the index has MANY cells (default 1024 over the 100× corpus),
  *   - the query batch is BOUNDED (default 100 queries × nProbe=4 →
  *     the static `cell IN` predicate prunes most partition dirs),
  *   - each timed phase runs in its OWN JVM with the page cache
  *     dropped in between (`sync; echo 3 > /proc/sys/vm/drop_caches`),
  *     so parquet reads actually hit the disk.
  *
  * Three modes, orchestrated by the caller so the cache drop can
  * happen between JVMs:
  *   build   — untimed: train centroids (k-means||) + codebooks, write
  *             the cell-partitioned store. Index work, amortized.
  *   query   — timed: [[Pq.ivfSdcPrerankTopKFromStore]] — reads ONLY
  *             the probed cells' code columns; prints the pruning
  *             stats (probed/total cells, bytes under probed dirs vs
  *             the store).
  *   rebuild — timed: the matching-budget NO-STORE alternative — read
  *             the raw vectors, assign + encode the corpus, run the
  *             in-memory prerank. Centroids/codebooks are READ FROM
  *             THE STORE (tiny), so neither side retrains and the two
  *             paths answer with identical budgets (and identical
  *             results — spec-pinned equality of the two entry points).
  *
  * usage: runMain graft.tools.StoreColdProbe <mode> <rawDir> <storeDir>
  *          [nCells] [nQueries] [nProbe] [preRankC] [k]
  */
object StoreColdProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val rawDir = args(1)
    val store = args(2)
    val nCells = if (args.length > 3) args(3).toInt else 1024
    val nQueries = if (args.length > 4) args(4).toInt else 100
    val nProbe = if (args.length > 5) args(5).toInt else 4
    val preRankC = if (args.length > 6) args(6).toInt else 50
    val k = if (args.length > 7) args(7).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName(s"store-cold-probe-$mode").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def raw = spark.read.parquet(s"$rawDir/embeddings.parquet")
      def queries = raw.filter(col("vec_id") < nQueries)
      mode match {
        case "grow" =>
          // replicate the embeddings table in place (the ScaleUp
          // perturbation recipe, embeddings only): rep×(rows) with
          // id offsets and a small deterministic per-replica jitter so
          // replicas are near but not identical — enough corpus for
          // the store-vs-rebuild crossover to be measurable on disk.
          // 4th positional arg = replication factor, 3rd = source dir.
          // REQUIRED in grow mode: inheriting nCells' default (1024)
          // would silently attempt a 1024× on-disk replication.
          require(args.length > 3,
            "grow mode requires an explicit replication factor: " +
              "StoreColdProbe grow <srcDir> <outDir> <rep>")
          val rep = nCells // positional reuse: <mode> <srcDir> <outDir> <rep>
          val src = spark.read.parquet(s"$rawDir/embeddings.parquet")
          val n = src.count()
          val grown = src.crossJoin(
              spark.range(rep).select(col("id").as("__rep")))
            .select((col("vec_id") + col("__rep") * n).as("vec_id"),
              transform(col("embedding"), x =>
                (x.cast("double") + (pmod(xxhash64(col("vec_id"),
                  col("__rep")), lit(1000)).cast("double") - 500.0) / 5e5)
                .cast("float")).as("embedding"),
              col("label"))
          grown.repartition(64).write
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$store/embeddings.parquet")
          println(s"[storecold] grow src=$rawDir out=$store rep=$rep " +
            s"rows=${n * rep}")

        case "build" =>
          val e = raw
          val cents = Similarity.trainedCentroids(e, "embedding", "vec_id",
            nCells = nCells)
          val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
          val en = e.select(col("vec_id").as("id"),
            Pq.normalized(col("embedding")).as("v"))
          val cb = Pq.trainCodebooks(en, "v", "id",
            dim = 64, m = 16, ksub = 16, iterations = 1)
          val t0 = System.nanoTime()
          Pq.writePqIndex(assigned, cents, cb, store,
            dim = 64, m = 16, ksub = 16)
          println(f"[storecold] build store=$store nCells=$nCells " +
            f"write_sec=${(System.nanoTime() - t0) / 1e9}%.2f")

        case "query" =>
          val t0 = System.nanoTime()
          val rows = Pq.ivfSdcPrerankTopKFromStore(spark, store, queries,
            "embedding", "vec_id", k = k, nProbe = nProbe,
            preRankC = preRankC).count()
          val sec = (System.nanoTime() - t0) / 1e9
          // pruning stats: bytes under the probed cell dirs vs the store
          val cents = spark.read.parquet(store + "/_centroids")
          val (units, cellIds, cdim) =
            Similarity.flatCentroids(cents, normalize = true)
          val probed = queries.select(explode(
              graft.functions.VectorExpressions.nearestCellsTopK(
                col("embedding"), units, cellIds, cdim, nProbe)).as("pc"))
            .select(col("pc.cell")).distinct().collect().map(_.getLong(0)).toSet
          def dirBytes(f: java.io.File): Long =
            if (f.isFile) f.length()
            else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum
          val cellDirs = Option(new java.io.File(store).listFiles())
            .getOrElse(Array.empty).filter(_.getName.startsWith("cell="))
          val total = cellDirs.map(dirBytes).sum
          val read = cellDirs
            .filter(d => probed.contains(d.getName.stripPrefix("cell=").toLong))
            .map(dirBytes).sum
          println(f"[storecold] query store=$store queries=$nQueries " +
            f"nProbe=$nProbe preRankC=$preRankC rows=$rows sec=$sec%.2f " +
            f"probed_cells=${probed.size}/${cellDirs.length} " +
            f"probed_bytes=$read/$total (${100.0 * read / total}%.1f%%)")

        case "rebuild" =>
          // the no-store path at the SAME budget: raw read + assign +
          // encode per batch, frozen index read from the store
          val t0 = System.nanoTime()
          val cents = spark.read.parquet(store + "/_centroids")
          val cb = spark.read.parquet(store + "/_codebooks")
          val e = raw
          val assigned = Similarity.assignCells(e, cents, "embedding", "vec_id")
          val rows = Pq.ivfSdcPrerankTopK(assigned, cents, cb, queries,
            "embedding", "vec_id", k = k, nProbe = nProbe,
            preRankC = preRankC, dim = 64, m = 16, ksub = 16).count()
          println(f"[storecold] rebuild rawDir=$rawDir queries=$nQueries " +
            f"nProbe=$nProbe preRankC=$preRankC rows=$rows " +
            f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")

        case other => sys.error(s"unknown mode '$other'")
      }
    } finally spark.stop()
  }
}
