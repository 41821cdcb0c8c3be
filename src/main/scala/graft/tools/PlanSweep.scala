package graft.tools

import graft.{Sessions, SparkEntry}

/** r6 coverage audit: build EVERY catalog query at the given SF and print a
  * one-line physical-plan summary (exchange count, join strategies, scan
  * smells) — the "no scale-killer anywhere" evidence for OPTIMIZATION_r06.md
  * without running 75 full benches.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, "graft-plan-sweep")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(plan).length
        val smells = Seq(
          "CartesianProduct" -> c("CartesianProduct"),
          "BroadcastNestedLoop" -> c("BroadcastNestedLoopJoin"),
          "SortAggregate" -> c("SortAggregate")).filter(_._2 > 0)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
        println(f"PLAN $name%-24s exch=${c("Exchange (?!hashpartitioning)") min c("Exchange")}%2d " +
          f"bhj=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d shj=${c("ShuffledHashJoin")}%2d " +
          (if (smells.nonEmpty) s"SMELL[$smells]" else "ok"))
      } catch { case e: Throwable =>
        println(s"PLAN $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
