package graft.tools

import graft.Sessions
import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Reader-memory probe for the streamed-after-side CDF partition reader
  * ([[graft.stream.CdfPartitionReader]]): drain a bootstrap batch whose
  * after-image CONTENT far exceeds the probe JVM's heap. This is possible
  * only because I/U rows STREAM — the reader's resident state is the
  * (empty) before-map plus a per-key winner locator (two ints + a long per
  * key, no payload strings) — whereas a both-sides-materialized reader
  * holds every content string of the after side plus the full diff buffer
  * and cannot fit.
  *
  * Two phases so the write can use a normal heap while the drain runs in a
  * deliberately small one (`-Xmx`), turning the memory claim into a
  * hard pass/fail:
  *
  * {{{
  *   CdfMemProbe write <dir> [rows] [contentChars]     # big heap
  *   CdfMemProbe drain <dir>                           # run with small -Xmx
  * }}}
  *
  * `drain` prints one JSON line: total content bytes drained, the JVM's
  * max heap, sampled peak used heap, partition count, rows drained.
  */
object CdfMemProbe {

  def main(args: Array[String]): Unit = args.toList match {
    case "write" :: dir :: rest =>
      val rows = rest.headOption.map(_.toInt).getOrElse(400000)
      val contentChars = rest.drop(1).headOption.map(_.toInt).getOrElse(4096)
      require(contentChars % 64 == 0, "contentChars must be a multiple of 64 (sha256 hex blocks)")
      val spark = Sessions.local(8, "cdf-mem-write")
      val table = LakeTable(s"$dir/table", 2)
      // deterministic pseudo-random content (chained sha256 hex blocks):
      // high-entropy so parquet can't compress it away and the manifest
      // sizeBytes the planner slices on stay honest
      val blocks = (0 until contentChars / 64).map(i =>
        sha2(concat(col("id").cast("string"), lit(s"-$i")), 256))
      val df = spark.range(rows).select(
        concat(lit("r"), pmod(col("id"), lit(8))).as("repo"),
        concat(lit("p"), col("id")).as("path"),
        lit("U").as("op"),
        col("id").as("seq"),
        concat(lit("c"), col("id")).as("commit"),
        lit("scala").as("language"),
        concat_ws("", blocks: _*).as("content"),
        lit(contentChars.toLong).as("size_bytes"))
      table.merge(spark, df, 0L)
      val h = table.head()
      println(s"""{"metric":"cdf_mem_write","rows":$rows,"contentChars":$contentChars,""" +
        s""""totalContentMB":${rows.toLong * contentChars / 1048576},""" +
        s""""version":${h.version},"manifestBytesMB":${h.manifests.map(_.sizeBytes).sum / 1048576}}""")
      spark.stop()

    case "drain" :: dir :: Nil =>
      // PartitionReaders are driven directly (no Spark job): the probe
      // measures THE READER's resident footprint, nothing else
      val stream = new graft.stream.CdfMicroBatchStream(s"$dir/table", 0, 0)
      val head = LakeTable.open(s"$dir/table").headVersion()
      val parts = stream.planInputPartitions(
        graft.stream.CdfOffset(0), graft.stream.CdfOffset(head))
      val factory = stream.createReaderFactory()
      val peak = new java.util.concurrent.atomic.AtomicLong(0)
      @volatile var sampling = true
      val rt = Runtime.getRuntime
      val sampler = new Thread(() => {
        while (sampling) {
          peak.getAndUpdate(p => math.max(p, rt.totalMemory - rt.freeMemory))
          Thread.sleep(5)
        }
      })
      sampler.setDaemon(true); sampler.start()
      var rowsDrained = 0L
      var contentBytes = 0L
      parts.foreach { p =>
        val r = factory.createReader(p)
        while (r.next()) {
          val row = r.get()
          rowsDrained += 1
          if (!row.isNullAt(5)) contentBytes += row.getUTF8String(5).numBytes
        }
        r.close()
      }
      sampling = false; sampler.join()
      println(s"""{"metric":"cdf_reader_memory","partitions":${parts.length},""" +
        s""""rowsDrained":$rowsDrained,"contentDrainedMB":${contentBytes / 1048576},""" +
        s""""heapMaxMB":${rt.maxMemory / 1048576},"peakUsedMB":${peak.get / 1048576},""" +
        s""""streamedOk":${contentBytes > rt.maxMemory}}""")

    case _ =>
      System.err.println("usage: CdfMemProbe write <dir> [rows] [contentChars] | drain <dir>")
      sys.exit(2)
  }
}
