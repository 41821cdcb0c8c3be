package graft.tools

import graft.Sessions
import graft.ops.TextOps
import graft.sources.{Sinks, Sources}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Demo driver for the non-CDC operator surface: text analysis over the
  * documents table, OBO dimension parse, FASTA export, and a live
  * streaming windowed aggregation over a file stream.
  *
  * Usage: OpsDemo <sfDir> <outDir>
  */
object OpsDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = Sessions.local(sys.env.getOrElse("GRAFT_CORES", "8").toInt, "graft-ops")
    import spark.implicits._

    // text analysis + fingerprint-dedup over documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val annotated = TextOps.annotate(docs)
    annotated.select("doc_id", "lang", "lang_pred", "n_tokens", "quality", "fingerprint")
      .orderBy("doc_id").show(5, truncate = 24)
    println(s"[ops] langid agreement vs labeled lang: " +
      annotated.agg(avg(when($"lang" === $"lang_pred", 1.0).otherwise(0.0))).first.getDouble(0))

    // OBO parse: build a dimension from a generated stanza file
    val obo = Seq(
      "[Term]", "id: GO:0000001", "name: alpha", "namespace: bp", "",
      "[Term]", "id: GO:0000002", "name: beta", "namespace: mf").mkString("\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outDir, "demo.obo"), obo)
    Sources.oboTerms(spark, s"$outDir/demo.obo").show(false)

    // FASTA export of document texts
    Sinks.fasta(docs.limit(3).select($"doc_id".cast("string").as("id"),
      regexp_replace($"text", "\\s+", "").as("seq")), "id", "seq", s"$outDir/fasta")
    println("[ops] fasta written: " +
      spark.read.text(s"$outDir/fasta").count() + " lines")

    // streaming: windowed counts over the events table replayed as a stream
    // (file-stream sources need a DIRECTORY; stage the table into one)
    val eventsDir = s"$outDir/events_stream"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(eventsDir))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = StreamingOps.windowedCounts(stream, "ts", "event_type",
        windowLen = "1 day", watermark = "0 seconds")
      .writeStream.format("memory").queryName("demo_wc").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(s"[ops] streaming windowed rows: ${spark.table("demo_wc").count()}")
    spark.table("demo_wc").orderBy($"window_start", $"event_type").show(8)
    spark.stop()
  }
}
