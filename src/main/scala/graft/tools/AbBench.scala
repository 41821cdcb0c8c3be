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
    spark.stop()
  }
}
