package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Reproducibility is the requirement these exist for: a training-data
  * sample must be re-derivable bit-for-bit months later (for ablations,
  * contamination audits, incremental refreshes), so both operators key on
  * a content-independent hash of the row id — never on `rand()`, partition
  * order, or row position, all of which change across runs/cluster sizes.
  *
  *  - [[hashSample]] — shuffle-free Bernoulli-by-hash: a row is kept iff
  *    the leading hex digits of md5(id) fall under a threshold. ZERO
  *    shuffle, ZERO extra passes — it is a plain codegen'd filter pushed
  *    into the scan stage, the only sampling shape that is free at 100 TB.
  *    Granularity is 16^-digits (1 hex digit → multiples of 1/16).
  *  - [[stratifiedSample]] — EXACT per-stratum counts (⌈pct·n⌉ rows per
  *    stratum, smallest-md5-first): one shuffle on the stratum key plus a
  *    per-stratum sort. Use when exact stratum proportions matter and the
  *    stratum cardinality is high enough to spread across executors; for
  *    low-cardinality strata (e.g. 5 languages) the per-stratum sort
  *    concentrates on few tasks — prefer [[hashSample]] there and accept
  *    the binomial wobble.
  *
  * md5 (not xxhash64) so external SQL engines reproduce the exact row set
  * — every sample is DuckDB-oracle-able.
  */
object SampleOps {

  /** Keep rows whose md5(id) starts below `keepSixteenths`/16 of the hex
    * space: `keepSixteenths = 1` keeps ~1/16 of rows, deterministically.
    */
  def hashSample(df: DataFrame, idCol: String, keepSixteenths: Int = 1): DataFrame = {
    require(keepSixteenths >= 1 && keepSixteenths <= 15, "keepSixteenths in [1,15]")
    val bound = keepSixteenths.toHexString
    df.filter(substring(md5(col(idCol).cast("string")), 1, 1) < lit(bound))
  }

  /** Exact stratified sample: the ⌈percent·n⌉ smallest-md5 rows of each
    * stratum. Integer-safe count math ((n·pct + 99) div 100, no IEEE ceil
    * edge) so external engines compute the identical cutoff.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       percent: Int = 10): DataFrame = {
    require(percent >= 1 && percent <= 100, "percent in [1,100]")
    val byHash = Window.partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val whole = Window.partitionBy(strataCol)
    df.withColumn("_rn", row_number().over(byHash))
      .withColumn("_n", count(lit(1)).over(whole))
      .filter(col("_rn") <=
        expr(s"CAST((_n * $percent + 99) DIV 100 AS BIGINT)"))
      .drop("_rn", "_n")
  }
}
