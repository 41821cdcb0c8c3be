package graft.ops

import graft.Sessions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 phase probe for d2_ngram_jaccard (in-package so it can reuse the
  * private postings/verify helpers verbatim — measurement only, the query
  * path itself stays in DedupOps).
  */
object D2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = Sessions.local(cpus, "graft-d2-probe")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val (idCol, textCol, n, threshold) = ("doc_id", "text", 3, 0.5)
    def time[T](k: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"D2 $k%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (round <- 0 until 2) {
      println(s"-- round $round calib=${graft.Bench.calibMhps(8, 1000L)}")
      val p = DedupOps.probePostings(df, idCol, textCol, n).persist()
      time("postings-count")(println("  postings=" + p.count()))
      val sets = time("sets-checkpoint")(
        p.groupBy("id").agg(sort_array(collect_list(col("shingle"))).as("sh"))
          .localCheckpoint())
      val counts = sets.select(col("id"), size(col("sh")).as("n_sh"))
      val freq = p.groupBy("shingle").agg(count(lit(1)).as("df"))
      val ranked = time("ranked-checkpoint")(p.join(freq, "shingle")
        .join(counts, Seq("id"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("id").orderBy(col("df"), col("shingle"))))
        .filter(col("rnk") <=
          col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + lit(1))
        .select("shingle", "id")
        .localCheckpoint())
      time("ranked-count")(println("  ranked=" + ranked.count()))
      val a = ranked.select(col("shingle"), col("id").as("id_a"))
      val b = ranked.select(col("shingle"), col("id").as("id_b"))
      val cand = time("cand-checkpoint")(a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
        .localCheckpoint())
      time("cand-count")(println("  cand=" + cand.count()))
      // length-filter selectivity: candidates surviving min >= t*max
      val nFiltered = cand
        .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
        .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
        .filter(least(col("n_a"), col("n_b")).cast("double") >=
          lit(threshold) * greatest(col("n_a"), col("n_b")) - lit(1e-9))
        .count()
      println(s"  lengthFilterSurvivors=$nFiltered")
      val out = DedupOps.probeVerify(cand, sets, threshold)
      time("verify-noop")(out.write.format("noop").mode("overwrite").save())
      p.unpersist()
    }
    spark.stop()
  }
}
