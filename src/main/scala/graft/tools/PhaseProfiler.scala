package graft.tools

import graft.Sessions
import graft.cdc.{Dedupe, Normalize}
import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Per-phase wall-clock breakdown of one replay batch at a given core
  * count. Usage: PhaseProfiler <logDir> <cores> [saltBuckets]
  */
object PhaseProfiler {
  def main(args: Array[String]): Unit = {
    val Array(logDir, coresS) = args.take(2)
    val cores = coresS.toInt
    val salt = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val spark = Sessions.local(cores, "graft-profile")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val raw = spark.read.schema(graft.model.Model.changeLogSchema).parquet(logDir)
    time("scan.count")(raw.count())
    time("scan.bytes")(raw.agg(sum(length(col("payload")))).collect())
    val norm = Normalize(raw).select(graft.stream.Tailer.mergeCols.map(col): _*)
    time("normalize.count")(norm.count())
    // force full materialization incl. the from_json payload decode —
    // count() alone lets Catalyst prune the decode entirely
    time("normalize.full")(norm.agg(sum(length(col("content")))).collect())
    time("dedupe.salted.full")(
      Dedupe.lwwSalted(norm, Seq("repo", "path"), "seq", salt)
        .agg(sum(length(col("content")))).collect())
    time("dedupe.typed.full")(
      Dedupe.lwwTyped(norm, Seq("repo", "path"), "seq")
        .agg(sum(length(col("content")))).collect())
    time("dedupe.typedSalted.full")(
      Dedupe.lwwTypedSalted(norm, Seq("repo", "path"), "seq", salt)
        .agg(sum(length(col("content")))).collect())
    time("dedupe.join.full")(
      Dedupe.lwwJoin(norm, Seq("repo", "path"), "seq")
        .agg(sum(length(col("content")))).collect())
    time("dedupe.plain")(Dedupe.lww(norm, Seq("repo", "path"), "seq").count())
    time("dedupe.salted")(Dedupe.lwwSalted(norm, Seq("repo", "path"), "seq", salt).count())
    time("dedupe.window")(Dedupe.lwwWindow(norm, Seq("repo", "path"), "seq").count())
    val work = java.nio.file.Files.createTempDirectory("prof").toString
    val table = LakeTable(s"$work/t", 64)
    val deduped = Dedupe.lwwTyped(norm, Seq("repo", "path"), "seq")
    // --- merge sub-steps, hand-unrolled with timers -----------------------
    val src = deduped.withColumn("_b", table.bucketExpr).persist()
    time("m.persist+buckets") {
      src.select("_b").distinct().collect()
    }
    time("m.src.count")(println(s"  srcRows=${src.count()}"))
    val tgt = table.read(spark) // empty
    val s = src.select(col("repo").as("s_repo"), col("path").as("s_path"),
      col("op").as("s_op"), col("seq").as("s_seq"), col("commit").as("s_commit"),
      col("language").as("s_language"), col("content").as("s_content"),
      col("size_bytes").as("s_size_bytes"))
    val j = tgt.join(s, tgt("repo") === s("s_repo") && tgt("path") === s("s_path"), "full_outer")
    val takeSrc = col("s_seq").isNotNull && (col("seq").isNull || col("s_seq") > col("seq"))
    val merged = j.filter(!(takeSrc && col("s_op") === "D")).select(
      coalesce(col("repo"), col("s_repo")).as("repo"),
      coalesce(col("path"), col("s_path")).as("path"),
      when(takeSrc, col("s_commit")).otherwise(col("commit")).as("commit"),
      when(takeSrc, col("s_language")).otherwise(col("language")).as("language"),
      when(takeSrc, col("s_content")).otherwise(col("content")).as("content"),
      when(takeSrc, col("s_size_bytes")).otherwise(col("size_bytes")).as("size_bytes"),
      when(takeSrc, col("s_seq")).otherwise(col("seq")).as("seq"))
    time("m.join.count")(merged.count())
    time("m.write.partitionBy")(
      merged.withColumn("_b", table.bucketExpr).repartition(col("_b"))
        .write.mode("overwrite").partitionBy("_b").parquet(s"$work/w1"))
    time("m.write.flat")(
      merged.write.mode("overwrite").parquet(s"$work/w2"))
    src.unpersist()
    time("merge.empty-target")(table.merge(spark, deduped, 0L))
    time("merge.self-again")(table.merge(spark, deduped, 1L)) // now target = full
    time("lineage.agg")(
      raw.groupBy(spark_partition_id().as("p"))
        .agg(min("seq"), max("seq"), count(lit(1)), sum(length(col("payload")))).collect())
    spark.stop()
  }
}
