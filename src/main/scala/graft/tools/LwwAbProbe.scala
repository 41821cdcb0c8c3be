package graft.tools

import graft.Sessions

/** Interleaved A/B of the Tailer's LWW strategies on the bench-shaped
  * 1M-event replay (same JVM, alternating trials, so host-throttle drift
  * hits both arms equally): A = single-pass hash-agg (broadcastMaxKeys=0
  * forces the lwwTyped fallback), B = two-pass broadcast LWW (default).
  */
object LwwAbProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-lww-ab")
    val base = java.nio.file.Files.createTempDirectory("ab-cdc").toString
    graft.gen.ChangeLogGen.write(spark,
      graft.gen.ChangeLogGen.GenConfig(seed = 42L, nEvents = 1000000L, nFiles = 64),
      s"$base/log")
    def replay(tag: String): Double = {
      val t0 = System.nanoTime()
      graft.stream.Tailer.replay(spark, graft.stream.Tailer.TailerConfig(
        logDir = s"$base/log", tableRoot = s"$base/t$tag",
        checkpointDir = s"$base/c$tag", lineageDir = s"$base/l$tag",
        metricsDir = s"$base/m$tag", numBuckets = 64))
      (System.nanoTime() - t0) / 1e9
    }
    replay("warm") // JIT/codegen warmup, untimed
    for (i <- 0 until rounds) {
      spark.conf.set("spark.graft.lww.broadcastMaxKeys", "0")
      val a = replay(s"A$i")
      spark.conf.set("spark.graft.lww.broadcastMaxKeys", "1000000")
      val b = replay(s"B$i")
      println(f"AB trial=$i typed=${a}%.3f broadcast=${b}%.3f calib=${graft.Bench.calibMhps(8, 1000L)}%.2f")
    }
    spark.stop()
  }
}
