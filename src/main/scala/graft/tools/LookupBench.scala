package graft.tools

import graft.Sessions
import graft.lake.LakeTable

/** Point-lookup latency probe: times `n` random-key lookups against the
  * table HEAD and reports mean/p50 plus the manifest-bounds pruning ratio
  * (candidate files vs bucket files). Run before and after
  * `compact <workDir> gc <targetFileRows>` to measure what sort-order
  * compaction + per-file key bounds buy on the read path.
  *
  * Usage: LookupBench <workDir> [n]
  */
object LookupBench {
  def main(args: Array[String]): Unit = {
    val workDir = args(0)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val spark = Sessions.local(sys.env.getOrElse("GRAFT_CORES", "8").toInt, "graft-lookup")
    val table = LakeTable.open(s"$workDir/table")
    val h = table.head()

    // deterministic key sample from the live table
    val keys = table.read(spark).select("repo", "path")
      .orderBy(org.apache.spark.sql.functions.hash(
        org.apache.spark.sql.functions.col("repo"),
        org.apache.spark.sql.functions.col("path")))
      .limit(n).collect().map(r => (r.getString(0), r.getString(1)))
    require(keys.nonEmpty, "table has no live rows")
    val m = keys.length // may be < n on small tables

    // pruning ratio (driver-side, no scan)
    val ratios = keys.map { case (r, p) =>
      val files = table.filesOf(h, table.bucketOf(r, p))
      val cand = files.count(LakeTable.fileMayContain(_, r, p))
      (cand, files.size)
    }
    val candTot = ratios.map(_._1).sum.toDouble
    val fileTot = ratios.map(_._2).sum.toDouble

    keys.take(5).foreach { case (r, p) => table.lookup(spark, r, p).collect() } // warmup
    val times = keys.map { case (r, p) =>
      val t0 = System.nanoTime()
      val rows = table.lookup(spark, r, p).collect()
      assert(rows.length == 1, s"lookup ($r,$p) returned ${rows.length} rows")
      (System.nanoTime() - t0) / 1e6
    }.sorted
    spark.stop()
    println(f"""{"metric":"lookup_latency_ms","n":$m,"mean":${times.sum / m}%.1f,"p50":${times(m / 2)}%.1f,"p90":${times(math.min(m - 1, (m * 9) / 10))}%.1f,"filesPerBucket":${fileTot / m}%.1f,"candidatesPerLookup":${candTot / m}%.2f,"version":${h.version}}""")
  }
}
