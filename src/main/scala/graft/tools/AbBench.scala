package graft.tools

import graft.Sessions
import graft.ops.DedupOps

/** One-JVM A/B timing of two implementations (fair under host variance).
  * Usage: AbBench <sfDir> <cores> [trials]
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, coresS) = args.take(2)
    val trials = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local(coresS.toInt, "graft-ab")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val times = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.minBy(_._1)
      println(f"[ab] $name%-22s best=${best._1}%6.2fs rows=${best._2} all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    time("jaccard.inverted")(
      DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("jaccard.prefix")(
      DedupOps.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count())

    // extreme-skew LWW A/B: does two-phase salting win when one key family
    // dominates? (zipfS=2.5 over 64 repos × 8 paths ⇒ top key ≫ uniform)
    if (sys.env.get("GRAFT_AB_SKEW").contains("1")) {
      import graft.cdc.Dedupe
      import graft.gen.ChangeLogGen
      import org.apache.spark.sql.functions._
      val logDir = java.nio.file.Files.createTempDirectory("skewlog").toString
      ChangeLogGen.write(spark, ChangeLogGen.GenConfig(seed = 42L,
        nEvents = 4000000L, nRepos = 64, pathsPerRepo = 8, zipfS = 2.5,
        nFiles = 64), logDir)
      val raw = spark.read.schema(graft.model.Model.changeLogSchema).parquet(logDir)
        .select("repo", "path", "seq", "op", "schema_id", "ts", "payload")
      val hot = raw.groupBy("repo", "path").count().orderBy(desc("count")).limit(1)
        .collect().head
      println(s"[ab] skew: hottest key ${hot.getString(0)}/${hot.getString(1)} = " +
        f"${hot.getLong(2)}%,d of 4,000,000 events (${hot.getLong(2) / 40000.0}%.1f%%)")
      time("lww.skew.typed")(
        Dedupe.lwwTyped(raw, Seq("repo", "path"), "seq")
          .agg(sum(length(col("payload")))).collect().head.getLong(0))
      time("lww.skew.typedSalted")(
        Dedupe.lwwTypedSalted(raw, Seq("repo", "path"), "seq", 16)
          .agg(sum(length(col("payload")))).collect().head.getLong(0))
    }
    spark.stop()
  }
}
