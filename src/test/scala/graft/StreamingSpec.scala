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

  test("streaming N-Quads ingestion: pattern filter over a file stream") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("rdf_stream").toString
    Files.write(java.nio.file.Paths.get(dir, "batch1.nq"),
      ("""<urn:a> <urn:name> "alice" .
         |<urn:a> <urn:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
         |<urn:b> <urn:name> "bob" <urn:g1> .
         |not a triple at all
         |""".stripMargin).getBytes("UTF-8"))
    val quads = graft.streaming.RdfStreams.readNQuads(spark, dir, lenient = true)
    assert(quads.isStreaming)
    // same field-level pattern predicates as the batch store
    val names = quads.filter(org.apache.spark.sql.functions.col("predicate.v") === "urn:name")
      .select(org.apache.spark.sql.functions.col("subject.v").as("s"),
        org.apache.spark.sql.functions.col("object.v").as("n"),
        org.apache.spark.sql.functions.col("graph.v").as("g"))
    val q = names.writeStream.format("memory").queryName("rdf_names")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("rdf_names").collect()
        .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
      assert(rows == Set(("urn:a", "alice", None), ("urn:b", "bob", Some("urn:g1"))))
      // second micro-batch: a new file arrives
      Files.write(java.nio.file.Paths.get(dir, "batch2.nq"),
        "<urn:c> <urn:name> \"carol\" .\n".getBytes("UTF-8"))
      q.processAllAvailable()
      assert(spark.table("rdf_names").count() == 3)
    } finally q.stop()
  }

  test("streaming N-Quads: strict mode fails the stream on malformed lines") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("rdf_stream_strict").toString
    Files.write(java.nio.file.Paths.get(dir, "bad.nq"), "garbage line\n".getBytes("UTF-8"))
    val q = graft.streaming.RdfStreams.readNQuads(spark, dir)
      .writeStream.format("memory").queryName("rdf_strict").outputMode("append").start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("streaming predicate counts aggregate the ingest") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("rdf_stream_pc").toString
    Files.write(java.nio.file.Paths.get(dir, "b.nq"),
      ("""<urn:a> <urn:name> "x" .
         |<urn:b> <urn:name> "y" .
         |<urn:a> <urn:age> "1" .
         |""".stripMargin).getBytes("UTF-8"))
    val counts = graft.streaming.RdfStreams.predicateCounts(
      graft.streaming.RdfStreams.readNQuads(spark, dir))
    val q = counts.writeStream.format("memory").queryName("rdf_pc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val byPred = spark.table("rdf_pc").collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(byPred == Map("urn:name" -> 2L, "urn:age" -> 1L))
    } finally q.stop()
  }

  test("streaming as-of enrichment binds each click to the latest prior view, across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.asofEnrichStream(input.toDS(), "click", "view")
      .writeStream.format("memory").queryName("asof_enrich").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "view", 10.0),
        Event(2, ts(5), 1, "click", 1.0), // → view@0
        Event(3, ts(5), 2, "click", 2.0), // no view for user 2 → null
        Event(4, ts(6), 1, "view", 20.0))
      q.processAllAvailable()
      // Batch 2: a late click (ts 3) must bind to the OLD view@0, not view@6;
      // a fresh click binds to view@6. State carries across batches.
      input.addData(
        Event(5, ts(3), 1, "click", 3.0), // late → view@0
        Event(6, ts(9), 1, "click", 4.0)) // → view@6
      q.processAllAvailable()
      val out = spark.table("asof_enrich").as[EventStreams.Enriched]
        .collect().map(e => e.event_id -> ((e.matched_ts.map(_.getTime), e.matched_value))).toMap
      assert(out(2L) === ((Some(ts(0).getTime), Some(10.0))))
      assert(out(3L) === ((None, None)))
      assert(out(5L) === ((Some(ts(0).getTime), Some(10.0))))
      assert(out(6L) === ((Some(ts(6).getTime), Some(20.0))))
    } finally q.stop()
  }

  test("streaming as-of trims right-event state to the buffer horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // 10-minute buffer: a view 30 minutes older than the newest view is evicted.
    val q = EventStreams.asofEnrichStream(input.toDS(), "click", "view", bufferMs = 10 * 60000L)
      .writeStream.format("memory").queryName("asof_trim").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(30), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(4), 1, "click", 0.0)) // view@0 evicted → no match ≤ ts(4)
      q.processAllAvailable()
      val out = spark.table("asof_trim").as[EventStreams.Enriched].collect()
      assert(out.length == 1 && out.head.matched_value.isEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join: watermarked event-time range condition, Spark-native") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // The streaming face of TemporalJoins.intervalJoin: Spark's built-in
    // stream-stream join already supports event-time range conditions with
    // watermark-bounded state, so no custom operator is needed — declare the
    // range predicate and let the engine manage state eviction.
    val lefts = MemoryStream[Event]
    val rights = MemoryStream[Event]
    val l = lefts.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r = rights.toDF().withWatermark("ts", "1 hour")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
    val joined = l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") && col("r_ts") < col("l_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_interval")
      .outputMode("append").start()
    try {
      lefts.addData(Event(1, ts(0), 1, "incident", 0.0))
      rights.addData(
        Event(10, ts(5), 1, "obs", 1.0), // in window
        Event(11, ts(12), 1, "obs", 2.0), // outside window
        Event(12, ts(5), 2, "obs", 3.0)) // other user
      q.processAllAvailable()
      val got = spark.table("ss_interval").select("l_id", "r_id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 10L)))
    } finally q.stop()
  }
}
