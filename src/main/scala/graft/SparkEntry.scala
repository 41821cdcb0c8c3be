package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the CDC engine end-to-end at mini scale — generate a
    * deterministic change log, stream-replay it through LWW dedupe into a
    * fenced LakeTable MERGE, return the final keyed state with its sha256
    * integrity column. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("entry").toString
    val cfg = gen.ChangeLogGen.GenConfig(seed = 42L, nEvents = 10000L, nFiles = 4)
    gen.ChangeLogGen.write(spark, cfg, s"$base/log")
    stream.Tailer.replay(spark, stream.Tailer.TailerConfig(
      logDir = s"$base/log", tableRoot = s"$base/table",
      checkpointDir = s"$base/ckpt", lineageDir = s"$base/lineage",
      metricsDir = s"$base/metrics", numBuckets = 16, saltBuckets = 8))
    lake.LakeTable(s"$base/table", 16).read(spark)
      .select(col("repo"), col("path"), col("seq"), col("language"),
        col("size_bytes"), sha2(col("content"), 256).as("sha256"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.sparkQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (minhash/simhash/LSH internals, heuristic scores, CDC replay) —
    * those get rows-only checks plus their own scalatest oracles.
    */
  def oracleSql: Map[String, String] = Queries.oracle
}
