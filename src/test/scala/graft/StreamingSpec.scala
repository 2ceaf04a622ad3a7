package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming operators driven through MemoryStream. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowed type stats aggregate incrementally with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.windowedTypeStats(input.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("win_stats").outputMode("update").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 2.0),
        Event(3, ts(2), 1, "view", 5.0), Event(4, ts(11), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_stats").collect()
      // windows align to epoch boundaries: first 3 events share one window,
      // the ts(11) click lands in a later one
      val clicks = rows.filter(_.getAs[String]("event_type") == "click")
      assert(clicks.map(_.getAs[Long]("events")).sum == 3)
      assert(clicks.exists(r => r.getAs[Long]("events") == 2 && r.getAs[Double]("total_value") == 3.0))
      assert(rows.exists(r => r.getAs[String]("event_type") == "view" && r.getAs[Long]("events") == 1))
      assert(clicks.map(_.getAs[Timestamp]("window_start")).distinct.length == 2)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two bursts separated by > 10 min → first closes when second arrives
      input.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(2), 1, "click", 1.0),
        Event(3, ts(30), 1, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      assert(rows.length == 1)
      val s = rows(0)
      assert(s.getAs[Long]("user_id") == 1 && s.getAs[Int]("events") == 2 &&
        s.getAs[Timestamp]("session_start") == ts(0) && s.getAs[Timestamp]("session_end") == ts(2))
    } finally q.stop()
  }

  test("streaming dedup drops same-content rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val q = EventStreams.dedupStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((ts(0), "hello world"), (ts(1), "hello world"), (ts(2), "other"))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }
}
