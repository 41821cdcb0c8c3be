package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Round-6 phase probe for the 1M-event CDC replay (guide §1): times the
  * replay's constituent stages in isolation — lineage aggregate, LWW dedupe +
  * normalize (noop sink), the LakeTable merge, and the full streaming replay —
  * so the optimization targets the real bottleneck, not a guess.
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-replay-probe")
    val base = java.nio.file.Files.createTempDirectory("probe-cdc").toString
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def p(k: String, v: Double): Unit =
      println(f"PROBE $k%-28s ${v}%8.3f s")

    p("gen-1M", time {
      graft.gen.ChangeLogGen.write(spark,
        graft.gen.ChangeLogGen.GenConfig(seed = 42L, nEvents = 1000000L, nFiles = 64),
        s"$base/log")
    })
    val raw = spark.read.parquet(s"$base/log")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the JIT on a small slice first
    noop(raw.limit(1000))

    p("scan-only", time(noop(raw)))
    p("lineage-agg", time(noop(raw.groupBy(spark_partition_id().as("p")).agg(
      min("seq"), max("seq"), count(lit(1)),
      sum(coalesce(length(col("payload")).cast("long"), lit(0L)))))))
    val rawCols = raw.select("repo", "path", "seq", "op", "schema_id", "ts", "payload")
    p("lww-only", time(noop(
      graft.cdc.Dedupe.lwwTyped(rawCols, Seq("repo", "path"), "seq"))))
    val deduped = graft.cdc.Normalize(
      graft.cdc.Dedupe.lwwTyped(rawCols, Seq("repo", "path"), "seq"))
      .select(graft.stream.Tailer.mergeCols.map(col): _*)
    p("lww+normalize", time(noop(deduped)))
    // isolate the post-LWW merge cost: cache the deduped winners first
    val cached = deduped.persist()
    p("lww-materialize", time(noop(cached)))
    val bExpr = pmod(hash(col("repo"), col("path")), lit(64))
    p("bucketed-write-tmp", time {
      cached.withColumn("_b", bExpr).repartition(col("_b"))
        .write.partitionBy("_b").parquet(s"$base/wtmp")
    })
    val shm = "/dev/shm/probe-cdc"
    p("bucketed-write-shm", time {
      cached.withColumn("_b", bExpr).repartition(col("_b"))
        .write.mode("overwrite").partitionBy("_b").parquet(s"$shm/wshm")
    })
    val table = graft.lake.LakeTable(s"$base/table1", 64)
    p("merge-into-empty", time {
      table.merge(spark, cached, 0L, updateColumns = None, retries = 3,
        srcKeyUnique = true)
    })
    cached.unpersist()
    p("full-replay-tmp", time {
      graft.stream.Tailer.replay(spark, graft.stream.Tailer.TailerConfig(
        logDir = s"$base/log", tableRoot = s"$base/table2",
        checkpointDir = s"$base/ckpt2", lineageDir = s"$base/lineage2",
        metricsDir = s"$base/metrics2", numBuckets = 64))
    })
    p("full-replay-shm", time {
      graft.stream.Tailer.replay(spark, graft.stream.Tailer.TailerConfig(
        logDir = s"$base/log", tableRoot = s"$shm/table3",
        checkpointDir = s"$shm/ckpt3", lineageDir = s"$shm/lineage3",
        metricsDir = s"$shm/metrics3", numBuckets = 64))
    })
    println("PROBE done " + graft.Bench.calibMhps())
    spark.stop()
  }
}
