package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR plus a
  * 1M-event CDC replay, one JSON line to stdout.
  *
  * Queries are forced through a noop sink (full materialization of every
  * output column — count() would let Catalyst prune the interesting work).
  */
object Bench {

  val headline: Seq[String] = Seq(
    "a4_lww", "a6_sum_pairs", "j1_enrichment", "j9_dim_join",
    "w1_topk_per_key", "d1_exact_dedup", "d2_ngram_jaccard",
    "d3_minhash_lsh", "s1_ann_bruteforce", "t4_fingerprint", "c8_sha256",
    "d7_decontaminate", "x1_hash_sample")

  /** Host CPU-grant calibration: M SHA-256 hashes/s/thread at `threads`
    * threads (pure ALU, no IO, no Spark). On this shared VM a clean window
    * measures ~11-14, a throttled one ~3-7 — emitting it before/after the
    * run lets a reader judge whether a given bench artifact caught a capped
    * window (BENCH.md "host calibration" section) without re-running.
    */
  def calibMhps(threads: Int = 8, millis: Long = 3000L): Double =
    // ONE calibration kernel repo-wide: delegate to ScalingBench.calibrate
    // (total hashes/s) so bench hostCalib, ScalingBench per-trial calib,
    // and the clean-window watchers' threshold stay comparable by
    // construction — a second copy could silently diverge (buffer size,
    // probe duration) and invalidate every cross-artifact comparison.
    tools.ScalingBench.calibrate(threads, millis) / threads / 1e6

  def main(args: Array[String]): Unit = {
    val calibPre = calibMhps()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-bench")

    def timeQuery(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    // per-query warmup run (JIT + code cache), then timed: best of 2
    val results = headline.map { n =>
      val a = timeQuery(n)
      val b = timeQuery(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }

    // CDC replay: generate a 1M-event log, stream-replay into a LakeTable.
    // A small warmup replay first so the timed run measures steady state
    // (JIT + codegen caches), same policy as the per-query best-of-2.
    val base = java.nio.file.Files.createTempDirectory("bench-cdc").toString
    gen.ChangeLogGen.write(spark,
      gen.ChangeLogGen.GenConfig(seed = 7L, nEvents = 100000L, nFiles = 8),
      s"$base/warmlog")
    stream.Tailer.replay(spark, stream.Tailer.TailerConfig(
      logDir = s"$base/warmlog", tableRoot = s"$base/warmtable",
      checkpointDir = s"$base/warmckpt", lineageDir = s"$base/warmlineage",
      metricsDir = s"$base/warmmetrics", numBuckets = 64))
    gen.ChangeLogGen.write(spark,
      gen.ChangeLogGen.GenConfig(seed = 42L, nEvents = 1000000L, nFiles = 64),
      s"$base/log")
    val t0 = System.nanoTime()
    stream.Tailer.replay(spark, stream.Tailer.TailerConfig(
      logDir = s"$base/log", tableRoot = s"$base/table",
      checkpointDir = s"$base/ckpt", lineageDir = s"$base/lineage",
      metricsDir = s"$base/metrics", numBuckets = 64))
    val cdcSecs = (System.nanoTime() - t0) / 1e9
    val cdcEps = 1000000L / cdcSecs

    // Locale.ROOT formatting throughout: the f-interpolator uses the
    // DEFAULT locale, and a comma-decimal locale (de_DE etc.) would turn
    // 4.53 into "4,53" — invalid JSON that loses the whole result line
    def num(x: Double, pat: String): String =
      String.format(java.util.Locale.ROOT, pat, Double.box(x))
    val qs = results.map { case (k, v) => s""""$k":${num(v, "%.3f")}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + cdcSecs
    // stop FIRST, print LAST: the result JSON must be the final stdout line
    // (round 1 lost its bench numbers to a post-print listener stack trace)
    spark.stop()
    val calibPost = calibMhps()
    val json =
      s"""{"metric":"total","value":${num(total, "%.3f")},"unit":"sec","queries":$qs,"sf":"$sfDir","cores":$cpus,"cdcReplay":{"events":1000000,"secs":${num(cdcSecs, "%.3f")},"eventsPerSec":${num(cdcEps, "%.0f")}},"hostCalib":{"threads":8,"preMhps":${num(calibPre, "%.2f")},"postMhps":${num(calibPost, "%.2f")},"cleanRefMhps":13.5}}"""
    // belt and braces vs stdout decoration (rounds 1+2 lost the line to
    // sbt's log prefix): persist the identical JSON next to the repo root
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
    println(json)
    System.out.flush()
  }
}
