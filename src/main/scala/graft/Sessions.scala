package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults: AQE on
  * (runtime re-plan, skew-join split), shuffle partitions sized to cores
  * (not the 200 default), UTC, broadcast threshold suited to dimension
  * joins. On a real cluster the same confs apply via spark-submit.
  */
object Sessions {
  def local(cores: Int, appName: String = "graft",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
    val withExtra = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
    val spark = withExtra.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
