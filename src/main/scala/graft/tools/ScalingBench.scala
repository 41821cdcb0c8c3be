package graft.tools

import graft.Sessions
import graft.gen.ChangeLogGen
import graft.gen.ChangeLogGen.GenConfig
import graft.stream.Tailer
import graft.stream.Tailer.TailerConfig
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (north_rule): replay the SAME change log at
  * two parallelism levels (local[N] and local[4N] stand in for N and 4N
  * executors — no real cluster in this sandbox) and report throughput at
  * both plus efficiency = (thru_4N / thru_N) / 4.
  *
  * Usage: ScalingBench [nEvents] [nSmall] [nBig] [outMd]
  */
object ScalingBench {

  def replayOnce(cores: Int, logDir: String, nEvents: Long): (Double, Double) = {
    val spark = Sessions.local(cores, s"graft-scale-$cores")
    val work = java.nio.file.Files.createTempDirectory(s"scale$cores").toString
    val cfg = TailerConfig(
      logDir = logDir, tableRoot = s"$work/table",
      checkpointDir = s"$work/ckpt", lineageDir = s"$work/lineage",
      metricsDir = s"$work/metrics", numBuckets = 64, saltBuckets = 16)
    val t0 = System.nanoTime()
    Tailer.replay(spark, cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (secs, nEvents / secs)
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nSmall = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val nBig = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val outMd = args.drop(3).headOption
    val trials = sys.env.getOrElse("GRAFT_BENCH_TRIALS", "3").toInt

    val genSession = Sessions.local(nBig, "graft-scale-gen")
    val logDir = java.nio.file.Files.createTempDirectory("scalelog").toString
    val tGen0 = System.nanoTime()
    ChangeLogGen.write(genSession, GenConfig(seed = 42L, nEvents = nEvents,
      nFiles = 64), logDir)
    val genSecs = (System.nanoTime() - tGen0) / 1e9
    genSession.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // This sandbox is a shared VM with heavy run-to-run CPU variance, so:
    // one JIT-warmup replay, then `trials` interleaved runs per level,
    // best-of reported (capability, not host noise).
    replayOnce(nBig, logDir, nEvents) // warmup (discard)
    val runs = (1 to trials).flatMap { _ =>
      Seq(nSmall -> replayOnce(nSmall, logDir, nEvents),
        nBig -> replayOnce(nBig, logDir, nEvents))
    }
    def best(c: Int) = runs.filter(_._1 == c).map(_._2).minBy(_._1)
    val (sSmall, thrSmall) = best(nSmall)
    val (sBig, thrBig) = best(nBig)
    val eff = (thrBig / thrSmall) / (nBig.toDouble / nSmall)
    val allRuns = runs.map { case (c, (s, t)) => f"""{"cores":$c,"secs":$s%.2f,"eps":$t%.0f}""" }
      .mkString("[", ",", "]")
    val json =
      f"""{"metric":"cdc_scaling","nEvents":$nEvents,"genSecs":$genSecs%.1f,""" +
        f""""cores_$nSmall":{"secs":$sSmall%.2f,"eventsPerSec":$thrSmall%.0f},""" +
        f""""cores_$nBig":{"secs":$sBig%.2f,"eventsPerSec":$thrBig%.0f},""" +
        f""""scalingEfficiency":$eff%.3f,"trials":$allRuns}"""
    println(json)
    outMd.foreach { p =>
      val md =
        f"""## CDC replay scaling (local[$nSmall] vs local[$nBig], same ${nEvents}%,d-event log)
           |
           || parallelism | wall secs | events/sec |
           ||---|---|---|
           || local[$nSmall] | $sSmall%.2f | $thrSmall%,.0f |
           || local[$nBig] | $sBig%.2f | $thrBig%,.0f |
           |
           |Scaling efficiency (thru_$nBig / thru_$nSmall) / (${nBig / nSmall}) = **$eff%.3f**
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), md)
    }
  }
}
