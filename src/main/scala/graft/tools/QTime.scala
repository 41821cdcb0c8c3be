package graft.tools

import graft.{Sessions, SparkEntry}

/** Time named catalog queries (noop sink, best-of-N) — ad-hoc perf probe.
  * Usage: QTime <sfDir> <cores> <trials> <query> [query…]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val trials = args(2).toInt
    val names = args.drop(3).toSeq
    val spark = Sessions.local(cores, "graft-qtime")
    names.foreach { n =>
      val times = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $n%-24s best=${times.min}%6.2fs all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
