package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** Structured Streaming rows (paged tailer, windowed aggs,
  * stateful running stats).
  * Pure relocation of the former SparkEntry map entries — no query or
  * oracle text changed in the split.
  */
private[graft] object StreamingQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_paged" -> ((s, d) => {
      // STREAMING the paged connector end to end, oracle-gated: publish
      // the documents extract as a page dump through the connector's
      // WRITE path, tail it as a stream (page number = offset), parse
      // payloads per micro-batch into a parquet sink, read back — the
      // result must BE the documents table. Proves dump → stream →
      // typed rows with no loss, duplication, or half-read pages.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val tmp = scratchDir("graft-stream-paged")
      t(s, d, "documents").select("doc_id", "lang", "n_chars")
        .toJSON.toDF("payload").repartition(4)
        .write.format("graft-paged")
        .option("dir", s"$tmp/pages").option("prefix", "documents")
        .mode("append").save()
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
      val q = ss.readStream.format("graft-paged")
        .option("dir", s"$tmp/pages").option("prefix", "documents").load()
        .select(from_json(col("payload"), sch).as("r"))
        .select("r.doc_id", "r.lang", "r.n_chars")
        .writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("doc_id")
    }),

    "q_stream_pq_append" -> ((s, d) => {
      // STREAMING the PQ-index daily-ingest shape, oracle-gated: build
      // a store over the first slice of the embeddings, then stream
      // the remainder in as arriving parquet drops whose foreachBatch
      // consumer is Pq.appendToPqIndex (the batch append — assignment
      // and encode run against the store's OWN persisted centroids/
      // codebooks, skipExistingIds guarding the engine's at-least-once
      // batch retries). maxFilesPerTrigger=1 forces one append per
      // drop, so the store grows across several sequential
      // micro-batches. The verdicts: the streamed store's ROWS and a
      // prerank top-k QUERY against it are both identical to a
      // one-shot writePqIndex over the whole corpus — the spec pin
      // (PqSpec append == rebuild) promoted to the driver gate, now
      // through the streaming engine's commit machinery.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val tmp = scratchDir("graft-stream-pqappend")
      val e = t(s, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val cents = Similarity.refineCentroids(e,
        Similarity.coarseCentroids(e, "v", "id", nCells = 16),
        "v", "id", iterations = 1)
      val assigned = Similarity.assignCells(e, cents, "v", "id")
      // the frozen index (centroids + codebooks) is shared by BOTH
      // stores — that is the append contract: appends never retrain
      val cb = graft.ext.Pq.trainCodebooks(
        e.select(col("id"), graft.ext.Pq.normalized(col("v")).as("v")),
        "v", "id", dim = 64, m = 8, ksub = 16, iterations = 1)
      val oneShot = s"$tmp/oneshot"
      graft.ext.Pq.writePqIndex(assigned, cents, cb, oneShot,
        dim = 64, m = 8, ksub = 16)
      val incr = s"$tmp/incr"
      val cut = 300L
      graft.ext.Pq.writePqIndex(assigned.filter(col("corpus_id") < cut),
        cents, cb, incr, dim = 64, m = 8, ksub = 16)
      e.filter(col("id") >= cut).repartition(3)
        .write.parquet(s"$tmp/batches")
      stageDrop(s"$tmp/batches", s"$tmp/in", "emb.parquet")
      val q = ss.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.ext.Pq.appendToPqIndex(batch.sparkSession, incr, batch,
            "v", "id", skipExistingIds = true)
        }
        .start()
      q.awaitTermination()
      // verdicts computed engine-side: store-level and query-level
      // equality with the one-shot build (symmetric except == empty).
      // Each compared frame is persisted: the two-direction exceptAll
      // reads each side twice, and the store-backed query side would
      // otherwise re-plan (partition listing + probe pass) per
      // direction — session-lifetime caches of tiny frames
      val cols = Seq("corpus_id", "cell", "codes", "cnorm").map(col)
      def cached(df: DataFrame) =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val storeA = cached(s.read.parquet(incr).select(cols: _*))
      val storeB = cached(s.read.parquet(oneShot).select(cols: _*))
      val storeDiff = storeA.exceptAll(storeB).count() +
        storeB.exceptAll(storeA).count()
      def top(p: String) = cached(graft.ext.Pq.ivfSdcPrerankTopKFromStore(
        s, p, e.filter(col("id") < 20), "v", "id",
        k = 10, nProbe = 4, preRankC = 50))
      val topI = top(incr); val topO = top(oneShot)
      val qDiff = topI.exceptAll(topO).count() +
        topO.exceptAll(topI).count()
      import s.implicits._
      Seq(("stream_append_query_equals_oneshot", qDiff == 0),
          ("stream_append_store_equals_oneshot", storeDiff == 0))
        .toDF("check_name", "ok").orderBy("check_name")
    }),

    "q_stream_windowed_counts" -> ((s, d) => {
      // STREAMING execution of the tumbling-window incremental protocol
      // (Q50's streaming form): file-stream the orders table →
      // watermarked windowed counts → upsert sink per micro-batch →
      // read the merged table back. The oracle is plain batch SQL, so
      // this row proves stream results == batch results. value sums
      // accumulate in decimal (order-independent under any micro-batch
      // schedule).
      //
      // State partitions are sized to the STATEFUL KEY LOAD, not the
      // session's scan parallelism: each shuffle partition of a
      // stateful query carries a state-store instance (open, snapshot,
      // commit per micro-batch), so a handful of window×type keys on
      // 32 stores is pure per-store overhead. The stream runs on a
      // CLONED session (own conf, shared SparkContext) so the override
      // never touches the caller's session — Verify plans queries from
      // 4 threads concurrently, and a set/restore on the shared conf
      // would race. At production scale this is the
      // `spark.sql.shuffle.partitions` the STREAMING job is launched
      // with (sized to keys/throughput), independent of batch jobs.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-stream")
      // the file source streams a DIRECTORY of drops — stage the table
      // file as one arriving drop
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("o_orderdate").cast("timestamp").as("ts"), // NTZ → event-time
          col("o_orderstatus").as("event_type"),
          col("o_totalprice").cast("decimal(18,2)").as("value"))
      val counts = graft.streaming.StreamSync.windowedCounts(stream, "ts", "1 day", "1 day")
      val out = counts.select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .withColumn("wyear", to_date(date_trunc("year", col("window_start"))))
      val q = graft.streaming.StreamSync.upsertSink(out, s"$tmp/table",
        keys = Seq("window_start", "event_type"), partitionCol = "wyear",
        checkpoint = s"$tmp/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
      s.read.parquet(s"$tmp/table")
        .select(col("window_start"), col("event_type"), col("n"),
          col("total_value").cast("double").as("total_value"))
        .orderBy("window_start", "event_type")
    }),

    "q_stream_running_stats" -> ((s, d) => {
      // CUSTOM STREAMING STATE, driver-visible: transformWithState
      // (StatefulProcessor + RocksDB state store) keeping running
      // per-user stats — the arbitrary-state upgrade of Q50's windowed
      // protocol. One AvailableNow micro-batch means the emitted state
      // equals the batch aggregate, so the oracle is plain SQL; the
      // projection keeps only order-independent fields (count, max-ts)
      // — the double running sum is exercised in StreamSyncSpec.
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-tws")
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders.parquet")
      // cloned session (own conf, shared context): the RocksDB provider
      // and the state-partition override stay invisible to the caller's
      // session — Verify plans queries concurrently. State partitions
      // are sized to the stateful key THROUGHPUT: per-row encoder +
      // RocksDB work dominates this query (150k rows), so use more
      // stores than the windowed row's key-bound 8 — but still not the
      // scan parallelism.
      val ss = s.newSession()
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      // changelog checkpointing (commit a small changelog instead of a
      // full RocksDB snapshot per micro-batch) is the right default for
      // long-lived high-frequency-commit streams, but for THIS one-shot
      // row it is pure overhead: version-1 commits still upload the
      // baseline snapshot, plus the changelog write on top. Env knob for
      // A/B measurement; default measured per SCALE.md round 8.
      ss.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ROCKS_CHANGELOG", "true"))
      locally {
        import ss.implicits._
        val stream = graft.streaming.StreamSync.readParquetStream(ss, s"$tmp/in", sch)
          .select(col("o_custkey").cast("long").as("userId"),
            col("o_orderdate").cast("timestamp").as("ts"),
            col("o_totalprice").cast("double").as("value"))
          .as[graft.streaming.StreamSync.UserEvent]
        val stats = graft.streaming.StreamSync.runningUserStats(stream)
        val q = stats.toDF().writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$tmp/out")
          }
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$tmp/out")
        .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
          col("lastSeen").as("last_seen"))
        .orderBy("user_id")
    }),

    "q_stream_dedup" -> ((s, d) => {
      // STREAMING EXACT DEDUP with bounded state: the input directory
      // receives the same orders drop TWICE (the at-least-once
      // re-delivery / backfill-replay shape) — dropDuplicatesWithin-
      // Watermark keeps one row per key and evicts state as the
      // watermark passes, so the output equals the batch distinct and
      // the oracle is plain SQL. Contrast: dropDuplicates would hold
      // every key forever.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-sdedup")
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders_drop1.parquet")
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders_drop2.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("ts"), // NTZ → event-time
          col("o_orderstatus"), col("o_totalprice"))
      val deduped = graft.streaming.StreamSync
        .dedupWithinWatermark(stream, "ts", "30 days", Seq("o_orderkey"))
      val q = deduped.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // unconditional write: probing isEmpty first would RE-EXECUTE
          // the stateful batch plan (foreachBatch frames re-run per
          // action) — the no-data flush batch writes only a footer
          batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("o_orderkey"), col("ts"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "q_stream_interval_join" -> ((s, d) => {
      // STREAM-STREAM INTERVAL JOIN, driver-visible: two order streams
      // (finished vs open) joined per customer within ±30 days — state
      // on both sides bounded by the watermark. One AvailableNow pass
      // over fully-arrived inputs emits every match, so the oracle is
      // the plain batch non-equi join.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-ssj")
      for (sub <- Seq("f", "o"))
        stageDrop(s"$d/orders.parquet", s"$tmp/$sub", "orders.parquet")
      def side(sub: String, status: String, tsName: String, idName: String) =
        graft.streaming.StreamSync.readParquetStream(ss, s"$tmp/$sub", sch)
          .filter(col("o_orderstatus") === status)
          .select(col("o_custkey").as("user_id"),
            col("o_orderdate").cast("timestamp").as(tsName),
            col("o_orderkey").as(idName))
      val joined = graft.streaming.StreamSync.streamIntervalJoin(
        side("f", "F", "c_ts", "click_id"),
        side("o", "O", "v_ts", "view_id"),
        "user_id", "c_ts", "v_ts", tolerance = "30 days", lateness = "30 days")
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // unconditional write: probing isEmpty first would RE-EXECUTE
          // the stateful batch plan (foreachBatch frames re-run per
          // action) — the no-data flush batch writes only a footer
          batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("user_id"), col("click_id"), col("view_id"))
        .orderBy("user_id", "click_id", "view_id")
    }),

    "q_stream_score" -> ((s, d) => {
      // STATELESS STREAMING SCORING: each arriving document scores
      // against the persisted DSIR model as ONE narrow expression
      // inside the micro-batch (scoreImportanceNarrow: model collapsed
      // to a 256-entry map literal, weight = decimal fold over the
      // token array) — no explode, no shuffle, no state store, no
      // watermark. The 100 TB deployment shape for "score the crawl as
      // it lands". One AvailableNow pass == the batch scorer bit-for-
      // bit, so the oracle is the plain batch replay.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "documents").schema
      val tmp = scratchDir("graft-sscore")
      stageDrop(s"$d/documents.parquet", s"$tmp/in", "documents.parquet")
      val model = graft.ext.Selection.fitImportanceModel(
        t(ss, d, "documents").filter(col("doc_id") < 400), "text", "doc_id",
        col("lang") === "en", nBuckets = 256)
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      val scored = graft.ext.Selection.scoreImportanceNarrow(
        stream, "text", "doc_id", model, nBuckets = 256)
      val q = scored.writeStream.outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("id")
    }),

    "q_stream_auc_binned" -> ((s, d) => {
      // MERGEABLE-SKETCH STREAMING EVAL: aucBinned's whole state is
      // the per-bin (pos, neg) count table — exactly a streaming
      // aggregate. The stream accumulates the 256 bins in COMPLETE
      // mode across whatever micro-batch schedule the source picks
      // (any schedule merges: the state is O(nBins) counts, the
      // mergeability aucBinned's docstring claims — this row PROVES it
      // end to end); the Mann-Whitney reduce then closes once on the
      // sink. One AvailableNow pass == the batch binned AUC on the
      // same rows, so the oracle is the plain batch replay.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "documents").schema
      val tmp = scratchDir("graft-saucb")
      stageDrop(s"$d/documents.parquet", s"$tmp/in", "documents.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      val nBins = 256
      val score = pmod(col("doc_id"), lit(997)).cast("double") / lit(997.0)
      val binned = stream.select(
          greatest(lit(0),
            least(floor(score * nBins).cast("int"), lit(nBins - 1))).as("s"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .groupBy(col("s"))
        .agg(sum(col("y")).as("np_s"),
          (count(lit(1)) - sum(col("y"))).as("nn_s"))
      val q = binned.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ext.Eval.mannWhitney(s.read.parquet(s"$tmp/out"), "auc_binned")
    }),

    "q_stream_ohlc" -> ((s, d) => {
      // STREAMING CANDLESTICKS: ohlc's whole state is per-(key,
      // bucket) {count, min/max value, min_by/max_by (epoch, value)
      // pairs} — all five are MERGEABLE declarative aggregates, so
      // the stream maintains live bars in COMPLETE mode across any
      // micro-batch schedule (state bounded by keys x observed
      // hours). One AvailableNow pass == the batch bars, so the
      // oracle is x_ohlc's replay verbatim.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "events").schema
      val tmp = scratchDir("graft-sohlc")
      stageDrop(s"$d/events.parquet", s"$tmp/in", "events.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("eus"),
          col("value"))
      val bars = graft.ops.TimeSeries.ohlcAgg(stream,
        "event_type", "eus", "value", bucketSize = 3600000000L)
      val q = bars.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out").orderBy("key", "bucket")
    }),

    "q_stream_srm" -> ((s, d) => {
      // STREAMING SRM GUARDRAIL: the chi2 goodness-of-fit state is one
      // counter per arm — the minimal mergeable state — accumulated in
      // COMPLETE mode across any micro-batch schedule; the shared
      // chi2GoFFromCounts closure prices the verdict on the sink. In
      // production this is the "did the bucketing service break"
      // monitor that pages BEFORE anyone reads a metric.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "events").schema
      val tmp = scratchDir("graft-ssrm")
      stageDrop(s"$d/events.parquet", s"$tmp/in", "events.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      val armCounts = stream
        .groupBy(pmod(col("user_id"), lit(2)).cast("string").as("group"))
        .agg(count(lit(1)).as("n_obs"))
      val q = armCounts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ext.Eval.chi2GoFFromCounts(
        s.read.parquet(s"$tmp/out"),
        Seq("0" -> ((1L, 2L)), "1" -> ((1L, 2L))), critValue = 3.841)
    }),

    "q_stream_conformal" -> ((s, d) => {
      // STREAMING CONFORMAL CALIBRATOR: conformal's calibration state
      // is the distinct-6-dp-score count table — mergeable counters,
      // so the stream accumulates the even-doc_id ramp scores in
      // COMPLETE mode across any micro-batch schedule (state bounded
      // by the 6-dp domain: <= 998 rows here), and the rank-threshold
      // closure prices qhat per alpha ONCE on the sink; empirical
      // coverage reads the odd-doc_id half batch-side. One
      // AvailableNow pass == the batch split, so the oracle is the
      // x_conformal replay on documents.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "documents").schema
      val tmp = scratchDir("graft-sconf")
      stageDrop(s"$d/documents.parquet", s"$tmp/in", "documents.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      def s6(c: org.apache.spark.sql.Column) =
        round((pmod(c, lit(997)).cast("double") / lit(997.0)), 6)
          .cast("decimal(18,6)")
      val calCounts = stream.filter(pmod(col("doc_id"), lit(2)) === 0)
        .groupBy(s6(col("doc_id")).as("s"))
        .agg(count(lit(1)).as("c"))
      val q = calCounts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      val evalCounts = t(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 1)
        .groupBy(s6(col("doc_id")).as("s"))
        .agg(count(lit(1)).as("c"))
      graft.ext.Eval.conformalFromCounts(
        s.read.parquet(s"$tmp/out"), evalCounts, Seq(0.1, 0.25))
    }),

    "q_stream_divergence" -> ((s, d) => {
      // STREAMING DRIFT MONITOR: termDivergence's whole state is a
      // per-term (ca, cb) count table — mergeable counters, so the
      // stream accumulates them in COMPLETE mode across any
      // micro-batch schedule (state is vocabulary-sized: sublinear in
      // the token volume by Heaps' law, the same boundedness class as
      // a streamed word-count) and the JS reduce closes once on the
      // sink. One AvailableNow pass == the batch en-vs-rest divergence
      // on the same rows, so the oracle is the plain batch replay.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "documents").schema
      val tmp = scratchDir("graft-sdiv")
      stageDrop(s"$d/documents.parquet", s"$tmp/in", "documents.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      val counts = stream.select(
          explode(split(lower(trim(col("text"))), "\\s+")).as("term"),
          when(col("lang") === "en", 1L).otherwise(0L).as("isA"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term"))
        .agg(sum(col("isA")).as("ca"),
          (count(lit(1)) - sum(col("isA"))).as("cb"))
      val q = counts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ext.Corpus.termDivergenceFromCounts(s.read.parquet(s"$tmp/out"))
    }),

    "q_stream_benford" -> ((s, d) => {
      // STREAMING FRAUD TRIPWIRE: Benford's whole state is NINE digit
      // counters — the minimal mergeable-state monitor, accumulated in
      // COMPLETE mode across any micro-batch schedule and closed by
      // the identical benfordFromCounts reduce the batch row uses, so
      // stream == batch by construction and the oracle is the plain
      // batch replay (x_benford's SQL verbatim).
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-sbenford")
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
      val counts = stream
        .filter(col("o_totalprice") >= 0.01)
        .select(graft.ops.Validate.benfordDigit(col("o_totalprice")).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val q = counts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ops.Validate.benfordFromCounts(s.read.parquet(s"$tmp/out"))
    }),

    "q_stream_changepoint" -> ((s, d) => {
      // STREAMING CHANGE-POINT MONITOR: the state is the per-day count
      // table (calendar-bounded mergeable counters, complete mode);
      // the retrospective CUSUM scan closes once on the sink with the
      // identical TimeSeries.changePoint finish the batch row uses —
      // stream == batch by construction, oracle = batch replay.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = scratchDir("graft-scp")
      stageDrop(s"$d/events.parquet", s"$tmp/in", "events.parquet")
      val raw = ss.read.parquet(s"$d/events.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", raw.schema)
      val tsUs = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast("timestamp")
        case _ => col("ts")
      }
      val counts = stream
        .select(date_trunc("day", tsUs).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
      val q = counts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ops.TimeSeries.changePoint(
        s.read.parquet(s"$tmp/out"), "day", "cnt")
    }),

    "q_stream_rolling_corr" -> ((s, d) => {
      // STREAMING FUNNEL CO-MOVEMENT: per-day (clicks, purchases)
      // counter pairs in complete mode — two mergeable counters per
      // calendar day — closed by the shared rollingCorrCounts finish;
      // stream == batch by construction, oracle = x_rolling_corr's
      // batch replay verbatim.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = scratchDir("graft-src")
      stageDrop(s"$d/events.parquet", s"$tmp/in", "events.parquet")
      val raw = ss.read.parquet(s"$d/events.parquet")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", raw.schema)
      val tsUs = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)")
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          col("ts").cast("timestamp")
        case _ => col("ts")
      }
      val counts = stream
        .select(date_trunc("day", tsUs).as("day"), col("event_type"))
        .groupBy(col("day"))
        .agg(count(when(col("event_type") === "click", 1)).as("clicks"),
          count(when(col("event_type") === "purchase", 1)).as("purchases"))
      val q = counts.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      graft.ops.TimeSeries.rollingCorrCounts(
        s.read.parquet(s"$tmp/out"), "day", "clicks", "purchases")
    }),

    "q_stream_enrich" -> ((s, d) => {
      // STREAM-STATIC ENRICHMENT: the most common streaming pattern —
      // a fact stream joined per micro-batch against a static dimension
      // snapshot. The dimension is BROADCAST per batch (it re-plans
      // each micro-batch, so a dim refresh between batches is picked up
      // automatically — the streaming analog of Q28's broadcast dict).
      // Stateless: no watermark, no state store. One AvailableNow pass
      // == the batch left join, so the oracle is plain SQL.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sch = t(s, d, "orders").schema
      val tmp = scratchDir("graft-senrich")
      stageDrop(s"$d/orders.parquet", s"$tmp/in", "orders.parquet")
      val dim = t(ss, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", sch)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val joined = stream
        .join(broadcast(dim), stream("o_custkey") === dim("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "q_stream_sessionize" -> ((s, d) => {
      // STREAMING SESSIONIZATION (session_window + watermark), the
      // gap-islands row's streaming form: append-mode session aggs only
      // emit once the WATERMARK passes a session's end, so a stream
      // that simply stops would withhold every user's final session
      // forever. The production fix is demonstrated, not worked around:
      // a HEARTBEAT drop (one punctuation event per user, far in the
      // future) arrives last and advances the watermark past every real
      // session. The heartbeat sessions themselves stay open at
      // termination and are never emitted, so the output equals the
      // batch gap-islands oracle exactly.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val tmp = scratchDir("graft-ssess")
      stageDrop(s"$d/events.parquet", s"$tmp/in", "events.parquet")
      // heartbeat drop: same raw schema, one 2100-01-01 row per user.
      // Built ONCE per (session, dir) by the shared fixture (the
      // distinct + parquet write is harness, not session_window work)
      // and linked in as the lexically-last drop
      val raw = ss.read.parquet(s"$d/events.parquet")
      val tsIsLong = raw.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      stageDrop(graft.registry.Fixtures.sessionizeHeartbeatDir(ss, d),
        s"$tmp/in", "zz_heartbeat.parquet")
      val eventTime =
        if (tsIsLong) expr("timestamp_micros(ts div 1000)") else col("ts")
      val stream = graft.streaming.StreamSync
        .readParquetStream(ss, s"$tmp/in", raw.schema)
        .select(col("user_id"),
          date_trunc("second", eventTime).as("tss"),
          // decimal BEFORE the session agg: the in-session sum must be
          // order-independent under any micro-batch/partial-agg order
          col("value").cast("decimal(18,2)").as("value"))
      val sessions = graft.streaming.StreamSync
        .sessionize(stream, "tss", "user_id", gap = "30 minutes", lateness = "0 seconds")
      val q = sessions.select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events").as("n"), col("total_value"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(s"$tmp/out")
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        // guard against a flush-batch emit of the heartbeat sessions —
        // semantics must not depend on exactly when the engine flushes
        .filter(col("session_start") < lit("2099-01-01").cast("timestamp"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n"), col("total_value").cast("double").as("total_value"))
        .orderBy("user_id", "session_start")
    })
  )

  val oracles: Map[String, String] = Map(
    // single-batch transformWithState == batch aggregate per user
    "q_stream_running_stats" ->
      """SELECT o_custkey AS user_id, count(*) AS n_events,
        |  max(CAST(o_orderdate AS TIMESTAMP)) AS last_seen
        |FROM orders GROUP BY o_custkey ORDER BY user_id""".stripMargin,

    "q_stream_paged" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_stream_pq_append" ->
      """SELECT * FROM (VALUES ('stream_append_query_equals_oneshot', TRUE),
        |  ('stream_append_store_equals_oneshot', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "q_stream_windowed_counts" ->
      """SELECT date_trunc('day', o_orderdate) AS window_start,
        |  o_orderstatus AS event_type, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // full-arrival AvailableNow pass ⇒ the interval join emits exactly
    // the batch non-equi join
    "q_stream_interval_join" ->
      """SELECT f.o_custkey AS user_id, f.o_orderkey AS click_id, o.o_orderkey AS view_id
        |FROM orders f JOIN orders o
        |  ON f.o_custkey = o.o_custkey
        |  AND o.o_orderdate >= f.o_orderdate - INTERVAL 30 DAY
        |  AND o.o_orderdate <= f.o_orderdate + INTERVAL 30 DAY
        |WHERE f.o_orderstatus = 'F' AND o.o_orderstatus = 'O'
        |ORDER BY user_id, click_id, view_id""".stripMargin,

    // stateless stream-static join ⇒ exactly the batch left join
    "q_stream_enrich" ->
      """SELECT o_orderkey, c_mktsegment, o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // batch replay of the streaming scorer: model fit on doc_id < 400,
    // EVERY document scored — same FNV buckets, 9-dp log-ratios,
    // exact integer×decimal count-weighted sums
    "q_stream_score" ->
      s"""WITH ftok AS (
         |  SELECT (lang = 'en') AS tgt,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents WHERE doc_id < 400),
         |fhb AS (
         |  SELECT tgt,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM ftok WHERE term <> ''),
         |rawb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM fhb GROUP BY 1),
         |tgtb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM fhb WHERE tgt GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT coalesce(sum(cr), 0) FROM rawb) AS rtot,
         |    (SELECT coalesce(sum(ct), 0) FROM tgtb) AS ttot),
         |allb AS (SELECT unnest(range(0, 256)) AS bucket),
         |lrs AS (
         |  SELECT allb.bucket,
         |    round(ln((coalesce(ct, 0) + 1.0) / (ttot + 256.0))
         |        - ln((coalesce(cr, 0) + 1.0) / (rtot + 256.0)), 9) AS lr
         |  FROM allb LEFT JOIN rawb USING (bucket)
         |    LEFT JOIN tgtb USING (bucket), tot),
         |btok AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents),
         |bhb AS (
         |  SELECT doc_id,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM btok WHERE term <> ''),
         |pb AS (SELECT doc_id, bucket, count(*) AS c FROM bhb GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, sum(c) AS n_tokens,
         |    round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(lr AS DECIMAL(18,12))) AS DOUBLE), 6) AS weight
         |  FROM pb JOIN lrs USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id AS id,
         |  CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens, per.weight
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
         |ORDER BY id""".stripMargin,

    // streamed bin counts == batch bin counts (mergeable O(nBins)
    // state), then the identical Mann-Whitney closure — plain batch
    // replay of the binned AUC
    // streamed complete-mode bars == batch bars: x_ohlc's replay
    "q_stream_ohlc" ->
      """WITH e AS (
        |  SELECT event_type AS key, epoch_us(ts) AS es, value AS v FROM events),
        |b AS (
        |  SELECT key, es // 3600000000 * 3600000000 AS bucket, es, v FROM e),
        |rn AS (
        |  SELECT key, bucket, v,
        |    row_number() OVER (PARTITION BY key, bucket ORDER BY es, v) AS ra,
        |    row_number() OVER (PARTITION BY key, bucket ORDER BY es DESC, v DESC) AS rd
        |  FROM b),
        |agg AS (
        |  SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
        |    max(v) AS high, min(v) AS low
        |  FROM b GROUP BY 1, 2)
        |SELECT a.key, a.bucket, a.n, o.v AS open, a.high, a.low, c.v AS close
        |FROM agg a
        |JOIN (SELECT key, bucket, v FROM rn WHERE ra = 1) o USING (key, bucket)
        |JOIN (SELECT key, bucket, v FROM rn WHERE rd = 1) c USING (key, bucket)
        |ORDER BY key, bucket""".stripMargin,

    // streamed arm counters == batch parity counts: the replay is
    // x_srm's SQL verbatim (one-pass == any micro-batch schedule)
    "q_stream_srm" ->
      """WITH o AS (
        |  SELECT CAST(user_id % 2 AS VARCHAR) AS "group",
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM events GROUP BY 1),
        |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS N FROM o),
        |t AS (
        |  SELECT "group", n_obs,
        |    CAST(N AS DOUBLE) * 1 / 2 AS n_exp,
        |    round((CAST(n_obs AS DOUBLE) - CAST(N AS DOUBLE) * 1 / 2) *
        |          (CAST(n_obs AS DOUBLE) - CAST(N AS DOUBLE) * 1 / 2) /
        |          (CAST(N AS DOUBLE) * 1 / 2), 9) AS term
        |  FROM o CROSS JOIN n),
        |s AS (
        |  SELECT round(CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) AS stat,
        |    CAST(count(*) - 1 AS BIGINT) AS dof
        |  FROM t)
        |SELECT "group", n_obs, round(n_exp, 6) AS n_exp, round(term, 6) AS term,
        |  stat, dof, stat > 3.841 AS srm_flag
        |FROM t CROSS JOIN s ORDER BY "group"""".stripMargin,

    // streamed calibration counts == batch split counts, so the
    // replay is the batch conformal on the same even/odd halves
    "q_stream_conformal" ->
      """WITH e AS (
        |  SELECT CAST(round(CAST(CAST(CAST(doc_id % 997 AS DOUBLE) / 997.0 AS VARCHAR) AS DECIMAL(38,30)), 6) AS DECIMAL(18,6)) AS s,
        |    doc_id % 2 = 0 AS cal
        |  FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM e WHERE cal),
        |cd AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM e WHERE cal GROUP BY s),
        |cum AS (
        |  SELECT s, c, sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cumc
        |  FROM cd),
        |al AS (SELECT unnest(CAST([0.1, 0.25] AS DOUBLE[])) AS alpha),
        |ranks AS (
        |  SELECT alpha, n_calib,
        |    CAST(ceil(CAST(n_calib + 1 AS DOUBLE) * (1.0 - alpha)) AS BIGINT) AS rk
        |  FROM al CROSS JOIN nc),
        |picks AS (
        |  SELECT r.alpha, min(cum.s) AS qhat
        |  FROM ranks r JOIN cum ON cum.cumc >= r.rk AND cum.cumc - cum.c < r.rk
        |  GROUP BY r.alpha),
        |ed AS (SELECT s, CAST(count(*) AS BIGINT) AS ce FROM e WHERE NOT cal GROUP BY s),
        |cov AS (
        |  SELECT r.alpha, r.n_calib, r.rk, p.qhat,
        |    CAST(sum(ed.ce) AS BIGINT) AS n_eval,
        |    CAST(sum(CASE WHEN p.qhat IS NOT NULL AND ed.s <= p.qhat THEN ed.ce ELSE 0 END) AS BIGINT) AS covc
        |  FROM ranks r LEFT JOIN picks p ON r.alpha = p.alpha CROSS JOIN ed
        |  GROUP BY 1, 2, 3, 4)
        |SELECT alpha, n_calib, rk, CAST(qhat AS DOUBLE) AS qhat, n_eval,
        |  CASE WHEN qhat IS NOT NULL THEN round(CAST(covc AS DOUBLE) / n_eval, 6) END AS coverage
        |FROM cov ORDER BY alpha""".stripMargin,

    "q_stream_auc_binned" ->
      """WITH e AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(doc_id % 997 AS DOUBLE) / 997.0 AS s
        |  FROM documents),
        |g AS (
        |  SELECT greatest(0, least(CAST(floor(s * 256) AS INTEGER), 255)) AS b,
        |    CAST(sum(y) AS BIGINT) AS np_s, CAST(count(*) - sum(y) AS BIGINT) AS nn_s
        |  FROM e GROUP BY 1),
        |a AS (
        |  SELECT b, np_s, nn_s,
        |    coalesce(sum(nn_s) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM g),
        |t AS (
        |  SELECT CAST(sum(np_s) AS BIGINT) AS n_pos, CAST(sum(nn_s) AS BIGINT) AS n_neg,
        |    sum(CAST(np_s AS HUGEINT) * (2 * nb + nn_s)) AS c2
        |  FROM a)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |       THEN round(CAST(c2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n_pos * n_neg), 6) END AS auc_binned
        |FROM t""".stripMargin,

    // one AvailableNow pass == the batch en-vs-rest divergence: the
    // identical SQL x_term_divergence replays
    "q_stream_divergence" ->
      """WITH ta AS (
        |  SELECT t.term FROM documents d,
        |    unnest(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
        |  WHERE d.lang = 'en' AND t.term <> ''),
        |tb AS (
        |  SELECT t.term FROM documents d,
        |    unnest(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
        |  WHERE d.lang <> 'en' AND t.term <> ''),
        |ca AS (SELECT term, CAST(count(*) AS BIGINT) AS ca FROM ta GROUP BY term),
        |cb AS (SELECT term, CAST(count(*) AS BIGINT) AS cb FROM tb GROUP BY term),
        |tot AS (
        |  SELECT (SELECT coalesce(sum(ca), 0) FROM ca) AS t_a,
        |    (SELECT coalesce(sum(cb), 0) FROM cb) AS t_b),
        |j AS (
        |  SELECT coalesce(ca.term, cb.term) AS term,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb, t_a, t_b
        |  FROM ca FULL OUTER JOIN cb USING (term) CROSS JOIN tot),
        |c AS (
        |  SELECT ca, cb, t_a, t_b,
        |    CASE WHEN t_a > 0 THEN CAST(ca AS DOUBLE) / t_a ELSE 0.0 END AS p,
        |    CASE WHEN t_b > 0 THEN CAST(cb AS DOUBLE) / t_b ELSE 0.0 END AS q
        |  FROM j)
        |SELECT CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
        |  CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
        |  CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared,
        |  CAST(max(t_a) AS BIGINT) AS tokens_a, CAST(max(t_b) AS BIGINT) AS tokens_b,
        |  CASE WHEN max(t_a) + max(t_b) > 0 THEN
        |    round(CAST(sum(CAST(round(
        |      (CASE WHEN ca > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END) +
        |      (CASE WHEN cb > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) / 2.0, 6) END AS js
        |FROM c""".stripMargin,

    // complete-mode (clicks, purchases) day counters + the shared
    // rollingCorrCounts finish == the batch x_rolling_corr replay
    "q_stream_rolling_corr" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, clicks, purchases,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(clicks) OVER w AS BIGINT) AS sx,
        |    CAST(sum(purchases) OVER w AS BIGINT) AS sy,
        |    CAST(sum(clicks * purchases) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(clicks * clicks) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(purchases * purchases) OVER w AS BIGINT) AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, clicks, purchases, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |        (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |      AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) END AS corr
        |FROM m ORDER BY day""".stripMargin,

    // complete-mode daily counters + the shared changePoint finish ==
    // the batch x_changepoint replay, verbatim
    "q_stream_changepoint" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT day, cnt,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(sum(cnt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total
        |  FROM daily),
        |sc AS (
        |  SELECT day, cnt, cum,
        |    CAST(abs(n * cum - t * total) AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * sqrt(CAST(t * (n - t) AS DOUBLE))) AS stat
        |  FROM p WHERE t < n)
        |SELECT day, cnt, cum, stat,
        |  stat = (SELECT max(stat) FROM sc) AS is_peak
        |FROM sc ORDER BY day""".stripMargin,

    // complete-mode digit counters + the shared benfordFromCounts
    // reduce == the batch x_benford replay, verbatim
    "q_stream_benford" ->
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice >= 0.01),
        |counts AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
        |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) AS t(digit, e6))
        |SELECT c.digit, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(tt.n_total AS DOUBLE) AS obs_share,
        |  CAST(e6 AS DOUBLE) / 1000000.0 AS exp_share,
        |  ((CAST(c.n AS DOUBLE) - CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0)) *
        |   (CAST(c.n AS DOUBLE) - CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0))) /
        |  (CAST(tt.n_total AS DOUBLE) * (CAST(e6 AS DOUBLE) / 1000000.0)) AS chi2_term
        |FROM counts c JOIN e USING (digit)
        |CROSS JOIN (SELECT sum(n) AS n_total FROM counts) tt
        |ORDER BY digit""".stripMargin,

    // full-arrival pass + heartbeat punctuation ⇒ streaming sessions ==
    // batch gap islands (the same SQL the batch sessionize row uses;
    // heartbeat rows are engine-side punctuation, not data, and their
    // own sessions are never emitted)
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS tss, value FROM events),
        |flagged AS (
        |  SELECT user_id, tss, value,
        |    CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss) <= INTERVAL 30 MINUTE
        |         THEN 0 ELSE 1 END AS new_sess
        |  FROM e),
        |numbered AS (
        |  SELECT user_id, tss, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, min(tss) AS session_start,
        |  max(tss) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, sess_id
        |ORDER BY user_id, session_start""".stripMargin,

    // the stream ingests the same drop twice; the dedup output must be
    // the plain batch table (orderkey is the key and is unique)
    "q_stream_dedup" ->
      """SELECT o_orderkey, o_orderdate AS ts, o_orderstatus, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
