package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Spark-side shape of a Pandas-UDF/mapInPandas pipeline —
  * this container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB; schema, partitioning, batch shape
  * and the typed Dataset plumbing are real and tested).
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      mime: String)

  /** Decoded features (what a real decoder/feature-extractor would emit). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int, // STUB-derived
      height: Int, // STUB-derived
      duration_ms: Long, // STUB-derived (audio/video)
      checksum: String) // real sha-256 of payload

  /** STUB decode kernel — deterministic fake standing in for
    * libjpeg/ffmpeg. A real deployment replaces ONLY this function (the
    * batch iterator shape is exactly mapInPandas'): it receives a batch
    * iterator per partition and must return one feature row per input.
    */
  def decodeKernelStub(batch: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { m =>
      // ??? real codec goes here; deterministic fake derives dims from bytes
      val h = java.util.Arrays.hashCode(m.bytes)
      val w = 64 + math.abs(h % 1857)
      MediaFeatures(
        media_id = m.media_id, kind = m.kind, n_bytes = m.bytes.length.toLong,
        width = w, height = 64 + math.abs((h / 7) % 1017),
        duration_ms = if (m.kind == "image") 0L else math.abs(h.toLong % 600000L),
        checksum = sha.digest(m.bytes).map("%02x".format(_)).mkString)
    }
  }

  /** Distributed decode/feature-extract: repartition so each task sees a
    * bounded batch (the executor-memory-bounded shape codecs need), then
    * run the kernel per partition. No driver collect, no shuffle besides
    * the explicit sizing repartition.
    */
  def extractFeatures(media: Dataset[MediaRow], targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions(decodeKernelStub)
  }

  /** Build a deterministic media table from any text frame (fixture:
    * payload = utf-8 bytes; kind round-robins image/audio/video).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        encode(col(textCol), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
  }

  /** End-to-end: text frame → media table → per-partition feature extract,
    * returned as a DataFrame (media_id, kind, n_bytes, width, height,
    * duration_ms, checksum).
    */
  def pipeline(df: DataFrame, idCol: String, textCol: String): DataFrame =
    extractFeatures(syntheticMedia(df, idCol, textCol)).toDF()
}
