package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / interval join operators Spark lacks natively.
  *
  * Both exist because the naive formulations collapse at scale: an as-of
  * or interval predicate is a NON-EQUI condition, which Catalyst can only
  * plan as BroadcastNestedLoopJoin or CartesianProduct — O(N·M) row
  * comparisons. Each operator here restates the semantics as an equi-join
  * or a window so the plan is a hash shuffle, never a product
  * (PlanSpec pins both shapes).
  */
object JoinOps {

  /** As-of join (point-in-time / temporal lookup): for every `left` row,
    * attach the payload of the LATEST `right` row with the same key and
    * `right.ts <= left.ts` — nulls when no right row is at or before the
    * left timestamp (LEFT OUTER asof, matching DuckDB's `ASOF LEFT JOIN`
    * and kdb's `aj`). Exactly one output row per left row.
    *
    * Shape: tag both sides, UNION, ONE window partitioned by key ordered
    * by (ts, side, payload) carrying the last non-null right payload
    * forward, keep the left rows. One hash shuffle on the key, NO join
    * node at all — at 100 TB the alternative non-equi join is a product,
    * and a per-key `collect_list` would materialize whole key histories
    * in single aggregation buffers.
    *
    * Semantics pinned by the sort:
    *  - right sorts BEFORE left at equal ts (side 0 < 1) → `<=`, not `<`;
    *  - equal (key, ts) right rows resolve to the LARGEST payload struct
    *    (field-lexicographic) — deterministic under ties by construction,
    *    where engines with unspecified asof tie-break (DuckDB included)
    *    are free to differ run-to-run.
    *
    * NULL timestamps sort first (Spark asc default): a null-ts left row
    * matches nothing (payload nulls — same as engines where NULL
    * comparisons are false), while a null-ts RIGHT row behaves as a
    * from-the-beginning-of-time record and can match every left row of
    * its key — DuckDB ASOF would never match it. Filter null right
    * timestamps upstream when strict NULL-comparison parity matters.
    *
    * NULL JOIN KEYS never match (SQL equality: NULL = NULL is not true):
    * right rows with any null key column are dropped before the window —
    * without that, `Window.partitionBy` would group null keys together
    * and hand null-keyed left rows a payload DuckDB's `ON l.k = r.k`
    * would never produce. Null-keyed LEFT rows still emit (payload
    * nulls), preserving the one-output-row-per-left-row contract.
    *
    * `right` must carry `keyCols ++ (tsCol +: payloadCols)`; payload
    * column names surface unchanged in the output (rename upstream on
    * collision with a left column). Skew note: one key's rows sort within
    * one task — for a pathological hot key, pre-split it upstream or
    * range-partition; key cardinality ≥ cores is the normal regime.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      s"payload columns ${payloadCols.filter(leftCols.contains).mkString(", ")} " +
        "collide with left columns — rename on the right side first")
    val keys = keyCols.map(col)
    val l = left.select(
      keys ++ Seq(
        col(tsCol).as("_ts"), lit(1).as("_side"),
        struct(leftCols.filterNot(keyCols.contains).map(col): _*).as("_l"),
        lit(null).cast(structType(right, payloadCols)).as("_r")): _*)
    val r = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _)) // SQL equality: null keys never match
      .select(
        keys ++ Seq(
          col(tsCol).as("_ts"), lit(0).as("_side"),
          lit(null).cast(structType(left, leftCols.filterNot(keyCols.contains))).as("_l"),
          struct(payloadCols.map(col): _*).as("_r")): _*)
    // _r joins the sort key so equal-(key, ts) right rows resolve
    // deterministically (left rows' null _r sorts first — harmless, they
    // are already ordered after right rows by _side)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_fill", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        keys ++
          leftCols.filterNot(keyCols.contains).map(c =>
            if (c == tsCol) col("_ts").as(tsCol) else col(s"_l.$c").as(c)) ++
          payloadCols.map(c => col(s"_fill.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /** Interval (range) join: every (`points` row, `intervals` row) pair
    * with equal keys and `loCol <= vCol <= hiCol` — inner-join
    * multiplicity (a point can hit many overlapping intervals, an
    * interval many points). Intervals with `hi < lo` match nothing
    * (BETWEEN semantics).
    *
    * Shape: intervals explode to the fixed-width bins they span, points
    * map to their single containing bin, candidates come from an
    * EQUI-join on (key, bin) and only candidates evaluate the range
    * predicate. A pair can meet in at most one bin (the point's), so no
    * dedup pass exists. Work is O(points + intervals · span/binWidth +
    * matches); pick `binWidth` near the typical interval length — too
    * small multiplies interval rows, too large degrades toward a per-key
    * product (candidates that fail the BETWEEN).
    *
    * `vCol`/`loCol`/`hiCol` are BIGINT (cast timestamps with
    * unix_micros). Bins use true floor division — negative domains bin
    * correctly ((-1 to 1) spans two bins at width 10, not one).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                vCol: String, loCol: String, hiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // The bin id is the FLOORED MULTIPLE itself (v − pmod(v, W) — pmod is
    // non-negative, so this floors correctly on negative domains), not
    // v div W: any injective bin label joins identically, and skipping
    // the division keeps every step in exact BIGINT Column arithmetic —
    // no expr() string splicing (quoted/dotted column names would parse
    // wrong) and no DOUBLE division (lossy past 2^53). Interval bins
    // enumerate via sequence(loBin, hiBin, step = W).
    def binOf(c: Column): Column = {
      val v = c.cast("bigint")
      v - pmod(v, lit(binWidth))
    }
    val p = points.withColumn("_bin", binOf(col(vCol)))
    val i = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("_bin", explode(sequence(
        binOf(col(loCol)), binOf(col(hiCol)), lit(binWidth))))
    p.join(i, keyCols :+ "_bin")
      .filter(col(vCol).between(col(loCol), col(hiCol)))
      .drop("_bin")
  }
}
