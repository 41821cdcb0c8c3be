package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Round-6 measurement harness (guide §1): NOT the driver bench — Bench.scala
  * is frozen. This main isolates each headline query behind the noop sink,
  * dumps `.explain("formatted")` to plans/<tag>/<query>_<tag>.txt, and prints
  * per-query times as JSON for OPTIMIZATION_r06.md evidence.
  *
  * Usage: sbt "runMain graft.tools.BenchExtra <tag> [query...]"
  *   tag = suffix for plan files (e.g. before / after)
  *   queries default to Bench.headline.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-bench-extra")
    val calib0 = graft.Bench.calibMhps()

    val planDir = java.nio.file.Paths.get(s"plans/r06")
    java.nio.file.Files.createDirectories(planDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = names.map { n =>
      spark.sparkContext.setJobDescription(s"bench-extra: $n")
      val build = SparkEntry.queries(n)
      // warmup + plan capture
      val df = build(spark, sfDir)
      java.nio.file.Files.writeString(planDir.resolve(s"${n}_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      noop(df)
      // timed: best of 2 (same policy as Bench)
      val a = time(noop(build(spark, sfDir)))
      val b = time(noop(build(spark, sfDir)))
      n -> math.min(a, b)
    }
    spark.sparkContext.setJobDescription(null)
    val calib1 = graft.Bench.calibMhps()
    def num(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val qs = results.map { case (k, v) => s""""$k":${num(v)}""" }.mkString("{", ",", "}")
    println(s"""BENCHEXTRA {"tag":"$tag","queries":$qs,"total":${num(results.map(_._2).sum)},"calib":{"pre":${num(calib0)},"post":${num(calib1)}}}""")
    spark.stop()
  }
}
