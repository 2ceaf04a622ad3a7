package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val quotes: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:20:00"), 99.0),
    (2L, ts("2024-01-01 10:02:00"), 50.0)
  ).toDF("key", "qts", "price")

  private lazy val trades: DataFrame = Seq(
    (10L, 1L, ts("2024-01-01 09:59:00")), // before any quote → null
    (11L, 1L, ts("2024-01-01 10:05:00")), // exact ts → inclusive match 101
    (12L, 1L, ts("2024-01-01 10:19:59")), // between → 101
    (13L, 1L, ts("2024-01-01 11:00:00")), // after all → 99
    (14L, 2L, ts("2024-01-01 10:03:00")), // other key → 50
    (15L, 3L, ts("2024-01-01 10:03:00")) // key with no right rows → null
  ).toDF("trade_id", "key", "tts")

  test("asofJoin picks the most recent right row at or before the left ts, per key") {
    val out = TemporalJoins.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(10L -> None, 11L -> Some(101.0), 12L -> Some(101.0),
      13L -> Some(99.0), 14L -> Some(50.0), 15L -> None))
  }

  test("asofJoin tolerance nulls out matches older than the window") {
    val out = TemporalJoins.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
        Seq("price"), toleranceMs = Some(60000L))
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    // 12 (last quote 14:59 earlier) and 13 (40 min) fall outside 60 s.
    assert(out === Map(10L -> None, 11L -> Some(101.0), 12L -> None,
      13L -> None, 14L -> Some(50.0), 15L -> None))
  }

  test("asofJoin keeps every left row and reports the matched right ts") {
    val out = TemporalJoins.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price"), outPrefix = "q_")
    assert(out.count() === trades.count())
    val m = out.select("trade_id", "q_matched_ts_ms").as[(Long, Option[Long])]
      .collect().toMap
    assert(m(13L) === Some(ts("2024-01-01 10:20:00").getTime))
    assert(m(10L) === None)
  }

  test("asofJoin equal-ts right duplicates resolve deterministically to the largest payload") {
    val dupQuotes = quotes.union(Seq((1L, ts("2024-01-01 10:05:00"), 200.0))
      .toDF("key", "qts", "price"))
    val out = TemporalJoins.asofJoin(trades, dupQuotes, Seq("key"), "tts", "qts", Seq("price"))
      .select("trade_id", "price").as[(Long, Option[Double])].collect().toMap
    assert(out(11L) === Some(200.0))
    assert(out(12L) === Some(200.0))
  }

  test("intervalJoin matches the plain inequality join, across bin widths") {
    val iv = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (101L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:21:00")), // overlaps 100
      (102L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")), // empty
      (103L, ts("2024-01-01 13:00:00"), ts("2024-01-01 12:00:00")) // inverted
    ).toDF("iv_id", "s", "e")
    val ev = trades.select(col("trade_id"), col("tts"))
    val expected = ev.join(iv, col("tts") >= col("s") && col("tts") < col("e"))
      .select("trade_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 60L, 600L, 86400L)) {
      val got = TemporalJoins.intervalJoin(ev, "tts", iv, "s", "e", binSeconds = w)
        .select("trade_id", "iv_id").as[(Long, Long)].collect().toSet
      assert(got === expected, s"binSeconds=$w")
    }
  }

  test("intervalJoin boundaries: start inclusive, end exclusive") {
    val iv = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")))
      .toDF("iv_id", "s", "e")
    val ev = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
      .toDF("eid", "tts")
    val got = TemporalJoins.intervalJoin(ev, "tts", iv, "s", "e", binSeconds = 300L)
      .select("eid").as[Long].collect().toSet
    assert(got === Set(1L))
  }
}
