package graft.tools

import graft.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-level timing of one bench-shaped 1M-event replay: a SparkListener
  * prints every job's wall time + description, exposing where the replay's
  * seconds go (scan/LWW/merge-write/metrics) without the UI.
  */
object ReplayJobsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-replay-jobs")
    val base = java.nio.file.Files.createTempDirectory("jobs-cdc").toString
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
    replay("warm")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties.getProperty("spark.job.description")).getOrElse("") +
            " stages=" + e.stageInfos.map(_.name).mkString("|").take(120)))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, d) =>
          println(f"JOB ${e.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val secs = replay("timed")
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"REPLAY total ${secs}%.3f s calib=${graft.Bench.calibMhps(8, 1000L)}%.2f")
    spark.stop()
  }
}
