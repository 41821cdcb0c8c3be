package graft.stream

import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** Streaming SOURCE over a [[LakeTable]]'s change-data-feed — the primitive
  * that makes a lake table itself a change-log a downstream pipeline can
  * tail (derived tables, projections, replication):
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("path", tableRoot)          // required
  *     .option("startVersion", "0")        // optional: feed begins AFTER it
  *     .load()                             // op/repo/path/… change rows
  * }}}
  *
  * Offsets ARE snapshot versions (monotonic by construction of the commit
  * protocol), so the checkpoint state is a single integer and a restart
  * resumes exactly where the sink committed. Each micro-batch is
  * `changesBetween(lastCommitted, head)` — IO proportional to CHANGED
  * buckets, never table size, and compaction-only version ranges diff to
  * zero rows. The default `startVersion = 0` makes the FIRST batch the
  * table's full live state as I-rows (bootstrap + tail in one stream).
  *
  * A LAGGING consumer catches up in ONE batch at endpoint-diff cost:
  * `changesBetween` diffs the two SNAPSHOT states, so falling 1000
  * versions behind costs the same as falling 1 behind for the same set of
  * changed buckets — there is deliberately no per-version replay and no
  * need for a rate limiter.
  *
  * Exactly-once composes the same way as the WAL tailer: the source gives
  * replayable version-window batches; an idempotent sink (e.g.
  * [[Tailer.applyChanges]] into a derived LakeTable, fenced by batchId)
  * makes replays no-ops.
  *
  * Works with `Trigger.AvailableNow` (drain-and-stop) via Spark's v1
  * source wrapper and with processing-time triggers for continuous follow.
  */
final class CdfSource(sqlContext: SQLContext, root: String, startVersion: Int)
  extends Source {

  // re-resolved per call: the table head moves under a live stream, and the
  // handle itself is cheap (HEAD + manifest reads are cached by path)
  private def table: LakeTable = LakeTable.open(root)

  override def schema: StructType = CdfSource.feedSchema

  override def getOffset: Option[Offset] = {
    val v = table.head().version
    if (v <= startVersion) None else Some(LongOffset(v.toLong))
  }

  /** Both LongOffset and the checkpoint-restored SerializedOffset print
    * their version as bare-integer JSON.
    */
  private def ver(o: Offset): Int = o.json.trim.toInt

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startVersion)
    val to = ver(end)
    val spark = sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val feed =
      if (to <= from)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        table.changesBetween(spark, from, to)
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    ColumnBridge.streamingFrame(spark, feed, schema)
  }

  // version retention is the table's own concern (expireSnapshots); the
  // source never deletes history
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"CdfSource[$root]"
}

object CdfSource {
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
}

/** `format("graft-cdf")` registration (also via META-INF/services). */
final class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdf"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), CdfSource.feedSchema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf needs .option(\"path\", <lake table root>)"))
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "meta", "HEAD")),
      s"graft-cdf: no lake table at $root")
    val start = parameters.get("startversion").map(_.trim.toInt).getOrElse(0)
    new CdfSource(sqlContext, root, start)
  }
}
