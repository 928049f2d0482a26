package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, UserRunning}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming: watermarked windows + custom keyed state, driven
  * synchronously through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked hourly windows aggregate per event type") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = EventsStream.hourlyTypeCounts(events)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:05:00"), "view", 10.0),
        (ts("2024-01-01 10:55:00"), "view", 5.0),
        (ts("2024-01-01 11:05:00"), "view", 7.0),
        (ts("2024-01-01 10:30:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .as[(java.sql.Timestamp, String, Long, BigDecimal)]
        .collect().sortBy(r => (r._1.getTime, r._2))
      assert(rows.map(r => (r._1.toString, r._2, r._3, r._4.toString)).toSeq == Seq(
        ("2024-01-01 10:00:00.0", "click", 1L, "1.00"),
        ("2024-01-01 10:00:00.0", "view", 2L, "15.00"),
        ("2024-01-01 11:00:00.0", "view", 1L, "7.00")))
    } finally q.stop()
  }

  test("mapGroupsWithState: running per-user totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventsStream.runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(EventsStream.RunningTotalsOutputMode).start()
    try {
      in.addData(Event(1L, ts("2024-01-01 10:00:00"), 10.0))
      q.processAllAvailable()
      in.addData(
        Event(1L, ts("2024-01-01 10:10:00"), 5.0),
        Event(2L, ts("2024-01-01 10:11:00"), 3.0))
      q.processAllAvailable()
      val latest = spark.table("running").as[UserRunning].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      // state carried across batches: user 1 accumulated 2 events / 15.0
      assert(latest(1L) == UserRunning(1L, 2L, 15.0))
      assert(latest(2L) == UserRunning(2L, 1L, 3.0))
    } finally q.stop()
  }

  test("session windows merge events within the gap, split beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventsStream.userSessions(events, gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:05:00"), 1L, 2.0),  // same session (≤10 min gap)
        (ts("2024-01-01 11:00:00"), 1L, 3.0),  // new session
        (ts("2024-01-01 10:00:00"), 2L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, BigDecimal)]
        .collect().sortBy(r => (r._3, r._1.getTime))
      assert(rows.map(r => (r._3, r._4, r._5.toString)).toSeq == Seq(
        (1L, 2L, "3.00"), (1L, 1L, "3.00"), (2L, 1L, "4.00")))
      // first session spans first event → last event + gap
      assert(rows.head._1.toString == "2024-01-01 10:00:00.0")
      assert(rows.head._2.toString == "2024-01-01 10:15:00.0")
    } finally q.stop()
  }

  test("streaming and batch compute the same hourly windows") {
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "view", 10.0),
      (ts("2024-01-01 11:05:00"), "view", 7.0))
      .toDF("ts", "event_type", "value")
    val out = EventsStream.hourlyTypeCounts(batch)
      .orderBy("hour_start")
      .as[(java.sql.Timestamp, String, Long, BigDecimal)].collect()
    assert(out.map(_._1.toString).toSeq ==
      Seq("2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0"))
    assert(out.map(_._3).toSeq == Seq(1L, 1L))
  }
}
