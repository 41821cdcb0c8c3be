package graft.tools

import graft.Sessions
import graft.gen.ChangeLogGen
import graft.gen.ChangeLogGen.GenConfig
import graft.lake.LakeTable
import graft.stream.Tailer
import graft.stream.Tailer.TailerConfig

/** COW vs MOR sustained-ingest A/B: same log, forced multi-batch replay
  * (maxFilesPerTrigger), then read + compact timings — one JVM so host
  * variance cancels. Usage: IngestAbBench [nEvents] [cores] [batches]
  */
object IngestAbBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val batches = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val spark = Sessions.local(cores, "graft-ingest-ab")
    val logDir = java.nio.file.Files.createTempDirectory("ablog").toString
    val nFiles = batches * 4
    ChangeLogGen.write(spark, GenConfig(seed = 42L, nEvents = nEvents, nFiles = nFiles), logDir)

    def replay(mode: String): (Double, LakeTable, TailerConfig) = {
      val base = java.nio.file.Files.createTempDirectory(s"ab$mode").toString
      val tc = TailerConfig(
        logDir = logDir, tableRoot = s"$base/table",
        checkpointDir = s"$base/ckpt", lineageDir = s"$base/lineage",
        metricsDir = s"$base/metrics", numBuckets = 64, tableMode = mode,
        maxFilesPerTrigger = Some(4))
      val t0 = System.nanoTime()
      Tailer.replay(spark, tc)
      ((System.nanoTime() - t0) / 1e9, LakeTable(tc.tableRoot, 64), tc)
    }
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }

    replay(LakeTable.Cow) // JIT warmup (discard)
    for (mode <- Seq(LakeTable.Cow, LakeTable.Mor)) {
      val (ingestSecs, table, _) = replay(mode)
      val (readSecs, liveRows) = timed(table.read(spark).count())
      val (compactSecs, _) = timed(table.compact(spark))
      val (readSecs2, _) = timed(table.read(spark).count())
      println(f"[ab] mode=$mode%-3s batches=$batches ingest=$ingestSecs%7.2fs " +
        f"(${nEvents / ingestSecs}%,.0f ev/s) read=$readSecs%5.2fs " +
        f"compact=$compactSecs%5.2fs readAfterCompact=$readSecs2%5.2fs " +
        f"liveRows=$liveRows%,d")
    }
    spark.stop()
  }
}
