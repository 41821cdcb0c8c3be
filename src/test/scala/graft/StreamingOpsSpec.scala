package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.KeyedEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured-Streaming operators: watermarked windows (append mode only
  * emits finalized windows), mapGroupsWithState running totals, and
  * event-time sessionization with gap timeout.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked windowed counts finalize when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.windowedCounts(df, "ts", "event_type")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(2), "view", 3.0))
      q.processAllAvailable()
      // nothing finalized yet (watermark still at minute ~2 - 10)
      assert(spark.table("wc").count() === 0)
      // an event far past the window advances the watermark beyond 10:05
      input.addData((ts(30), "click", 9.0))
      q.processAllAvailable()
      input.addData((ts(59), "click", 9.0)) // push watermark again
      q.processAllAvailable()
      // multiple windows may finalize (10:00 and 10:30); check the first
      val rows = spark.table("wc")
        .filter($"window_start" === ts(0))
        .select($"event_type", $"n").as[(String, Long)].collect().toMap
      assert(rows("click") === 2L) // 10:00-10:05 window: 2 clicks
      assert(rows("view") === 1L)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StreamingOps.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("rt").outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(KeyedEvent(1L, ts(0), 10.0), KeyedEvent(1L, ts(1), 5.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(2), 1.0), KeyedEvent(2L, ts(2), 7.0))
      q.processAllAvailable()
      val byUser = spark.table("rt").as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(byUser(1L)._2 === 3L)
      assert(byUser(1L)._3 === 16.0)
      assert(byUser(2L)._2 === 1L)
      assert(byUser(2L)._3 === 7.0)
    } finally q.stop()
  }

  test("stream-stream join matches pairs within the event-time interval") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingOps.streamStreamJoin(
        clicks.toDF().toDF("user_id", "ts", "value"),
        buys.toDF().toDF("user_id", "ts", "value"),
        "user_id", "ts", within = "10 minutes")
      .writeStream.format("memory").queryName("ssj").outputMode(OutputMode.Append())
      .start()
    try {
      clicks.addData((1L, ts(0), 1.0), (2L, ts(0), 2.0))
      buys.addData((1L, ts(5), 100.0)) // within 10 min of user 1's click
      buys.addData((2L, ts(30), 200.0)) // outside the interval for user 2
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((9L, ts(59), 0.0)); buys.addData((9L, ts(59), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj").select($"user_id", $"r_value")
        .as[(Long, Double)].collect().toSet
      assert(rows.contains((1L, 100.0)), s"got $rows")
      assert(!rows.exists(_._1 == 2L), "out-of-interval purchase must not join")
    } finally q.stop()
  }

  test("event-time sessionization closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(KeyedEvent(1L, ts(0), 1.0), KeyedEvent(1L, ts(1), 1.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() === 0) // session still open
      // events 30 min later advance the watermark; user 1's session times out
      input.addData(KeyedEvent(2L, ts(30), 1.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(2L, ts(40), 1.0)) // advance watermark further
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .select($"user_id", $"n").as[(Long, Long)].collect()
      assert(sessions.contains((1L, 2L)), s"got ${sessions.toSeq}")
    } finally q.stop()
  }

  test("sessionization splits by gap WITHIN one micro-batch (backfill shape)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("sess2").outputMode(OutputMode.Append())
      .start()
    try {
      // ONE batch carries two clusters 9 minutes apart: a replayed history
      // must yield the same two sessions a live run would, not one
      // batch-spanning blob
      input.addData(
        KeyedEvent(1L, ts(0), 1.0), KeyedEvent(1L, ts(1), 1.0),
        KeyedEvent(1L, ts(10), 1.0), KeyedEvent(1L, ts(11), 1.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(2L, ts(50), 1.0)) // advance the watermark
      q.processAllAvailable()
      input.addData(KeyedEvent(2L, ts(55), 1.0))
      q.processAllAvailable()
      val got = spark.table("sess2").filter($"user_id" === 1L)
        .select($"start", $"end", $"n")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(got === Set((ts(0), ts(1), 2L), (ts(10), ts(11), 2L)),
        s"two gap-separated sessions expected, got $got")
    } finally q.stop()
  }
}
