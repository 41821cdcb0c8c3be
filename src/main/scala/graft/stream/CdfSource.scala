package graft.stream

import graft.lake.LakeTable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming SOURCE over a [[LakeTable]]'s change-data-feed — the primitive
  * that makes a lake table itself a change-log a downstream pipeline can
  * tail (derived tables, projections, replication):
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("path", tableRoot)              // required
  *     .option("startVersion", "0")            // optional: feed begins AFTER it
  *     .option("maxVersionsPerBatch", "10")    // optional: bounded catch-up
  *     .load()                                 // op/repo/path/… change rows
  * }}}
  *
  * DSv2 `MicroBatchStream` with admission control (the supported long-term
  * streaming-source API — replaces the round-3 v1 `Source`):
  *
  *  - '''Offsets ARE snapshot versions''' (monotonic by construction of the
  *    commit protocol): checkpoint state is one integer, restart resumes
  *    exactly where the sink committed.
  *  - '''One HEAD read per poll tick''': the [[LakeTable]] handle is opened
  *    ONCE per stream; `latestOffset` reads only the one-line HEAD pointer
  *    ([[LakeTable.headVersion]]) — snapshot/manifest bodies are read only
  *    when a batch is actually planned (2 metadata round-trips per 500ms
  *    follow tick on object storage would not be acceptable).
  *  - '''Distributed diff, O(changed buckets)''': a batch is the live-state
  *    diff of the two endpoint snapshots. A bucket whose manifest ref is
  *    identical in both snapshots cannot differ (manifests are immutable),
  *    so each CHANGED bucket becomes one `InputPartition` whose reader
  *    diffs that bucket's files EXECUTOR-SIDE (LWW-fold each side, emit
  *    I/U/D) — no driver collect, work scales with the bucket count.
  *    Reader memory is BOUNDED at any table size: a bucket whose endpoint
  *    state exceeds `maxStateRowsPerPartition` (manifest row counts — a
  *    plan-time decision, no data IO) splits into hash-of-key slice
  *    partitions, each re-reading that bucket's files but retaining only
  *    its slice. Compaction-only version ranges re-read their buckets but
  *    diff to zero rows, never false changes.
  *  - '''Bounded catch-up''' (`maxVersionsPerBatch`): a lagging consumer
  *    drains a deep backlog in version-windowed batches of at most that
  *    width instead of one giant endpoint diff — each window still costs
  *    only its changed buckets. Unset = catch up in ONE endpoint-diff
  *    batch (falling 1000 versions behind costs the same as falling 1
  *    behind for the same changed-bucket set).
  *  - '''Trigger.AvailableNow''' natively ([[SupportsTriggerAvailableNow]]):
  *    the head captured at prepare time is the drain target, composing
  *    with `maxVersionsPerBatch` into bounded drain-and-stop.
  *
  * The default `startVersion = 0` makes the FIRST batch the table's full
  * live state as I-rows (bootstrap + tail in one stream). Exactly-once
  * composes as with the WAL tailer: replayable version-window batches + an
  * idempotent sink ([[Tailer.applyChanges]], fenced by batchId) make
  * replays no-ops. Version retention is the table's own concern
  * (expireSnapshots); the source never deletes history.
  */
object CdfFeed {
  /** One change row: op ∈ I/U/D + the table columns (I/U = after-image,
    * D = before-image). Matches [[LakeTable.changesBetween]] exactly.
    */
  val feedSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("language", StringType),
    StructField("content", StringType),
    StructField("size_bytes", LongType),
    StructField("seq", LongType)))

  /** Default reader-memory bound: a changed bucket whose endpoint state
    * exceeds this many rows (known at PLAN time from the manifests' row
    * counts — no data IO) is split into hash-of-key slices, each its own
    * InputPartition. Bounds executor memory at any table size; the cost is
    * k sequential re-reads of that one bucket's files.
    */
  val DefaultMaxStateRows: Long = 8000000L
}

/** Snapshot-version offset (serialized as the bare integer, same wire
  * format as the round-3 v1 source's LongOffset — old checkpoints restore).
  */
final case class CdfOffset(version: Int) extends Offset {
  override def json: String = version.toString
}

/** `format("graft-cdf")` registration (also via META-INF/services). */
final class CdfTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  private def rootOf(options: java.util.Map[String, String]): String = {
    val root = options.get("path")
    if (root == null) throw new IllegalArgumentException(
      "graft-cdf needs .option(\"path\", <lake table root>)")
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "meta", "HEAD")),
      s"graft-cdf: no lake table at $root")
    root
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    rootOf(options); CdfFeed.feedSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CdfTable(rootOf(new CaseInsensitiveStringMap(properties)))
}

final class CdfTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-cdf:$root"
  override def schema(): StructType = CdfFeed.feedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CdfScan(root,
        options.getInt("startversion", 0),
        options.getInt("maxversionsperbatch", 0),
        options.getLong("maxstaterowsperpartition", CdfFeed.DefaultMaxStateRows))
    }
}

final class CdfScan(root: String, startVersion: Int, maxVersionsPerBatch: Int,
                    maxStateRows: Long = CdfFeed.DefaultMaxStateRows)
  extends Scan {
  override def readSchema(): StructType = CdfFeed.feedSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdfMicroBatchStream(root, startVersion, maxVersionsPerBatch, maxStateRows)
  override def description(): String = s"graft-cdf[$root]"
}

final class CdfMicroBatchStream(root: String, startVersion: Int,
                                maxVersionsPerBatch: Int,
                                maxStateRows: Long = CdfFeed.DefaultMaxStateRows)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(maxStateRows > 0,
    s"graft-cdf: maxStateRowsPerPartition must be positive, got $maxStateRows")
  require(maxVersionsPerBatch >= 0,
    s"graft-cdf: maxVersionsPerBatch must be >= 0 (0 = unbounded), got $maxVersionsPerBatch")

  // opened ONCE per stream: snapshot metadata is immutable and cached by
  // the handle; only the HEAD pointer is re-read per poll
  private[graft] val table: LakeTable = LakeTable.open(root)

  // AvailableNow drain target, captured once at query start: commits that
  // land while the drain runs belong to the next query
  @volatile private var availableNowTarget: Option[Int] = None

  private def ver(o: Offset): Int = o.json.trim.toInt

  override def initialOffset(): Offset = CdfOffset(startVersion)

  override def deserializeOffset(json: String): Offset = CdfOffset(json.trim.toInt)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.headVersion())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val base = math.max(ver(start), startVersion)
    // ONE small-file read per tick (the HEAD pointer line names the version)
    val target = availableNowTarget.getOrElse(table.headVersion())
    val capped =
      if (maxVersionsPerBatch > 0) math.min(target, base + maxVersionsPerBatch)
      else target
    CdfOffset(math.max(base, capped))
  }

  override def reportLatestOffset(): Offset = CdfOffset(table.headVersion())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = math.max(ver(start), startVersion)
    val to = ver(end)
    if (to <= from) return Array.empty
    val (sFrom, sTo) =
      try (table.snapshotAt(from), table.snapshotAt(to))
      catch { case _: java.nio.file.NoSuchFileException =>
        throw new IllegalStateException(
          s"graft-cdf: snapshot window [$from, $to] has been expired " +
            "(expireSnapshots ran past the checkpoint) — incremental history " +
            "is gone; bootstrap the consumer with a full read() and a fresh " +
            "checkpoint seeded at head")
      }
    def files(s: LakeTable.Snapshot, b: Int): Array[String] =
      table.filesOf(s, b).map(f => s"$root/${f.path}").toArray
    // reader-memory bound: a bucket whose endpoint state exceeds
    // maxStateRows (known from the manifests' denormalized row counts — no
    // data IO at plan time) becomes k hash-of-key slice partitions
    def sliced(bucket: Int, before: Array[String], after: Array[String],
               rows: Long): Seq[InputPartition] = {
      val k = math.max(1L, (rows + maxStateRows - 1) / maxStateRows).toInt
      (0 until k).map(i => CdfInputPartition(bucket, before, after, i, k))
    }
    // a rebucket inside the window changes the key→bucket mapping, so
    // per-bucket pairing is unsound — fall back to a whole-state diff
    // (still slice-split under the same memory bound). Conservative on
    // legacy snapshots (numBuckets unrecorded, -1): the moduli cannot be
    // PROVEN equal, and pairing bucket ids across different moduli would
    // emit a moved key as same-seq D+I rows the downstream LWW breaks
    // arbitrarily — whole-state diff unless both sides record the same
    // positive modulus.
    if (!(sFrom.numBuckets > 0 && sFrom.numBuckets == sTo.numBuckets)) {
      val all = (s: LakeTable.Snapshot) =>
        table.filesOf(s).map(f => s"$root/${f.path}").toArray
      return sliced(-1, all(sFrom), all(sTo),
        math.max(sFrom.totalRows, sTo.totalRows)).toArray
    }
    val refsFrom = sFrom.manifests.map(r => r.bucket -> r).toMap
    val refsTo = sTo.manifests.map(r => r.bucket -> r).toMap
    (refsFrom.keySet ++ refsTo.keySet).toArray.sorted
      .filter(b => refsFrom.get(b) != refsTo.get(b))
      .flatMap { b =>
        val rows = math.max(refsFrom.get(b).map(_.rowCount).getOrElse(0L),
          refsTo.get(b).map(_.rowCount).getOrElse(0L))
        sliced(b, files(sFrom, b), files(sTo, b), rows)
      }
  }

  override def createReaderFactory(): PartitionReaderFactory = new CdfReaderFactory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"CdfMicroBatchStream[$root]"
}

/** One changed bucket (or hash-of-key slice of one): that bucket's data
  * files in each endpoint snapshot (absolute paths — executors need no
  * table handle). bucket = -1 marks the whole-state fallback partition
  * (rebucket inside the window). `(slice, nSlices)` restrict the reader to
  * keys with hash % nSlices == slice — how oversized buckets keep reader
  * memory bounded.
  */
final case class CdfInputPartition(bucket: Int, beforeFiles: Array[String],
                                   afterFiles: Array[String],
                                   slice: Int = 0, nSlices: Int = 1)
  extends InputPartition

final class CdfReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdfPartitionReader(partition.asInstanceOf[CdfInputPartition])
}

/** Executor-side bucket diff: LWW-fold each side's files (duplicate keys
  * across MOR append files resolve to the highest seq — COW buckets are
  * unique-per-key already and fold to themselves), drop tombstones, then
  * emit I (after only), D (before only, before-image) and U (both present,
  * any payload column differs null-safely — same rule as
  * [[LakeTable.changesBetween]]).
  */
final class CdfPartitionReader(p: CdfInputPartition)
  extends PartitionReader[InternalRow] {

  private final case class Rec(commit: String, language: String, content: String,
                               sizeBytes: java.lang.Long, seq: Long, deleted: Boolean)

  private def readSide(files: Array[String]): scala.collection.mutable.HashMap[(String, String), Rec] = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val m = new scala.collection.mutable.HashMap[(String, String), Rec]
    val conf = new org.apache.hadoop.conf.Configuration()
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f))
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val key = (g.getString("repo", 0), g.getString("path", 0))
          if (inSlice(key)) {
            def has(n: String) = g.getType.containsField(n) && g.getFieldRepetitionCount(n) > 0
            def str(n: String) = if (has(n)) g.getString(n, 0) else null
            val seq = g.getLong("seq", 0)
            // LWW: highest seq per key wins within the bucket
            if (!m.get(key).exists(_.seq >= seq))
              m.put(key, Rec(str("commit"), str("language"), str("content"),
                if (has("size_bytes")) java.lang.Long.valueOf(g.getLong("size_bytes", 0))
                else null,
                seq, has("deleted") && g.getBoolean("deleted", 0)))
          }
          g = reader.read()
        }
      } finally reader.close()
    }
    m
  }

  /** Slice membership for split oversized buckets — any deterministic key
    * hash works as long as both endpoint reads use the same one.
    */
  private def inSlice(key: (String, String)): Boolean =
    p.nSlices <= 1 || math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(key._1 + "\u0000" + key._2),
      p.nSlices) == p.slice

  private def live(files: Array[String]) = readSide(files).filterNot(_._2.deleted)

  private def differs(a: Rec, b: Rec): Boolean =
    a.commit != b.commit || a.language != b.language || a.content != b.content ||
      a.sizeBytes != b.sizeBytes || a.seq != b.seq

  private val rows: Iterator[InternalRow] = {
    val before = live(p.beforeFiles)
    val after = live(p.afterFiles)
    def u(s: String) = if (s == null) null else UTF8String.fromString(s)
    def row(op: String, k: (String, String), r: Rec): InternalRow =
      new GenericInternalRow(Array[Any](
        u(op), u(k._1), u(k._2), u(r.commit), u(r.language), u(r.content),
        if (r.sizeBytes == null) null else r.sizeBytes.longValue, r.seq))
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    after.foreach { case (k, a) =>
      before.get(k) match {
        case None => out += row("I", k, a)
        case Some(b) => if (differs(a, b)) out += row("U", k, a)
      }
    }
    before.foreach { case (k, b) => if (!after.contains(k)) out += row("D", k, b) }
    out.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
