package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators beyond the CDC tailer: event-time
  * windowed aggregation with watermarks, and custom keyed state via
  * mapGroupsWithState. The reference is pure batch (SURVEY §2.9), so these
  * are the engine's forward-looking stream surface over the same tables.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts per key (late data beyond the
    * watermark is dropped; append mode emits only finalized windows).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      // watermarks require TIMESTAMP (LTZ); parquet sources often carry NTZ
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col(s"window.start").as("window_start"), col(keyCol),
        col("n"), col("total"))

  final case class KeyedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class RunningState(n: Long, total: Double)
  final case class RunningTotal(user_id: Long, n: Long, total: Double)

  /** Custom keyed state: running per-key totals via mapGroupsWithState
    * (update mode) — the engine's KeyValueGroupedDataset state surface.
    */
  def runningTotals(events: Dataset[KeyedEvent]): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[RunningState, RunningTotal](GroupStateTimeout.NoTimeout) {
        (user, evs, state: GroupState[RunningState]) =>
          val prev = state.getOption.getOrElse(RunningState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          evs.foreach { e => n += 1; total += e.value }
          val next = RunningState(n, total)
          state.update(next)
          RunningTotal(user, next.n, next.total)
      }
  }

  /** Stream-stream inner join with watermarked state cleanup: clicks ⋈
    * purchases per user within a bounded event-time interval. Both sides
    * carry watermarks so Spark can GC join state (unbounded otherwise —
    * the thing that kills naive stream joins at scale).
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String,
                       within: String = "10 minutes"): DataFrame = {
    val l = left.withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, within)
      .select(col(keyCol).as("k"), col(tsCol).as("l_ts"), col("value").as("l_value"))
    val r = right.withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, within)
      .select(col(keyCol).as("r_k"), col(tsCol).as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("k") === col("r_k") &&
        col("r_ts").between(col("l_ts"), col("l_ts") + expr(s"INTERVAL $within")),
      "inner")
      .select(col("k").as(keyCol), col("l_ts"), col("r_ts"),
        col("l_value"), col("r_value"))
  }

  final case class Session(user_id: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class OpenSessions(sessions: Seq[SessionState])

  /** Event-time sessionization with a gap timeout via flatMapGroupsWithState.
    *
    * Sessions are split by GAP, not by micro-batch: a key's events inside
    * one batch (the availableNow/backfill shape delivers a whole history
    * at once) are sweep-merged into gap-separated sessions, so the result
    * is the same whether the data arrives live or replayed — batch timing
    * only decides WHEN a session is emitted, never its boundaries. A
    * session is emitted once the event-time watermark passes its end +
    * gap (earlier emission could miss late within-watermark events that
    * extend it); the rest stay in state behind a timeout clamped above
    * the current watermark (setTimeoutTimestamp rejects stale stamps).
    */
  def sessionize(events: Dataset[KeyedEvent], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, evs, state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming = evs.map(e =>
            SessionState(e.ts.getTime, e.ts.getTime, 1L)).toSeq
          // sweep-merge intervals whose gap is within gapMs
          val merged = (prior ++ incoming).sortBy(s => (s.start, s.end))
            .foldLeft(List.empty[SessionState]) { (acc, s) =>
              acc match {
                case h :: t if s.start - h.end <= gapMs =>
                  SessionState(math.min(h.start, s.start),
                    math.max(h.end, s.end), h.n + s.n) :: t
                case _ => s :: acc
              }
            }.reverse
          // STRICT close: an in-watermark event at exactly ts = end+gapMs
          // (ts >= wm is deliverable) still merges into this session
          // (merge rule start - end <= gapMs), so closing at equality
          // could split one session in live mode that a replay would
          // merge — close only once no mergeable event can still arrive.
          // Timeout firing guarantees wm > the end+gapMs it was set to,
          // so strictness never strands a session open.
          val (closed, open) = merged.partition(_.end + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            state.setTimeoutTimestamp(
              math.max(open.map(_.end + gapMs).min, wm + 1))
          }
          closed.iterator.map(s => Session(user,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n))
      }
  }
}
