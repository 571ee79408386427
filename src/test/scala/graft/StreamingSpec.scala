package graft

import graft.streaming.{InMemoryUpsertSink, RidePipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming-semantics tests of the reference pipeline (SURVEY.md §2.6):
  * window assignment, late-data merge within the watermark, update-mode
  * emission, and idempotent per-(city, window) upsert accumulation.
  * MemoryStream drives the exact production plan (same Catalyst tree as
  * the Kafka source). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def rideJson(city: String, epochS: Double, fare: Double, id: String): String =
    s"""{"trip_id":"$id","city":"$city","fare_amount":$fare,"event_timestamp":$epochS}"""

  // 2024-01-01 00:00:00 UTC
  private val t0 = 1704067200.0

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runBatches(batches: Seq[Seq[String]]): InMemoryUpsertSink = {
    val source = MemoryStream[String]
    val metrics = RidePipeline.metricsPlan(source.toDF(), streaming = true)
    val sink = new InMemoryUpsertSink
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = RidePipeline.start(metrics, sink, ckpt, Trigger.ProcessingTime(0))
    try batches.foreach { b => source.addData(b); q.processAllAvailable() }
    finally q.stop()
    sink
  }

  test("window assignment: epoch-aligned 1-minute tumbling, end-exclusive") {
    val sink = runBatches(Seq(Seq(
      rideJson("nyc", t0 + 30, 10.0, "a"),   // window [00:00, 00:01)
      rideJson("nyc", t0 + 59, 20.0, "b"),   // same window
      rideJson("nyc", t0 + 60, 40.0, "c"),   // next window [00:01, 00:02)
    )))
    val m = sink.cityMetrics("nyc")
    assert(m.total_trips == 3)
    // latest window is [00:01,00:02): avg = 40.0, last_updated = 00:02:00
    assert(m.average_fare == 40.0)
    assert(m.last_updated.toInstant.getEpochSecond == (t0 + 120).toLong)
  }

  test("late within watermark merges into its original window; upsert is idempotent") {
    val sink = runBatches(Seq(
      // batch 1: two events 00:00 window, one at 00:30 to advance max event time
      Seq(rideJson("sf", t0 + 10, 10.0, "a"), rideJson("sf", t0 + 30 * 60, 30.0, "b")),
      // batch 2: late event at 00:25 min — beyond 10-min watermark (wm = 00:20) → dropped;
      // late event at 00:29:30 — within watermark? wm = 00:30 - 10min = 00:20, so kept.
      Seq(rideJson("sf", t0 + 25 * 60 + 5, 99.0, "dropped_nope"),
        rideJson("sf", t0 + 29 * 60 + 30, 50.0, "kept")),
    ))
    val m = sink.cityMetrics("sf")
    // windows: [00:00] count 1; [00:30] count 1; [00:25] dropped?  NO —
    // 00:25 > wm 00:20 ⇒ kept. Only events with window end ≤ wm are dropped.
    // So total = 4 here; the drop case is asserted in the next test.
    assert(m.total_trips == 4, m.toString)
  }

  test("late beyond watermark is dropped") {
    val sink = runBatches(Seq(
      Seq(rideJson("la", t0 + 10, 10.0, "a"), rideJson("la", t0 + 30 * 60, 30.0, "b")),
      // watermark after batch 1 = 00:30 - 10min = 00:20.
      // event at 00:05 → window [00:05, 00:06), end 00:06 < 00:20 → dropped.
      Seq(rideJson("la", t0 + 5 * 60, 99.0, "too_late")),
    ))
    val m = sink.cityMetrics("la")
    assert(m.total_trips == 2, m.toString)
    assert(m.average_fare == 30.0)
  }

  test("update-mode re-emission replaces a window's contribution (no double count)") {
    val sink = runBatches(Seq(
      Seq(rideJson("chi", t0 + 10, 10.0, "a")),
      // same window gets one more event in the next batch → update-mode
      // re-emits (window, chi) with count 2; the keyed upsert must replace,
      // not add (the reference's additive quirk would yield 3 — §2.6.4).
      Seq(rideJson("chi", t0 + 20, 30.0, "b")),
    ))
    val m = sink.cityMetrics("chi")
    assert(m.total_trips == 2, m.toString)
    assert(m.average_fare == 20.0)
  }

  test("malformed JSON becomes null fields, excluded by count(trip_id) key null group") {
    val source = MemoryStream[String]
    val metrics = RidePipeline.metricsPlan(source.toDF(), streaming = true)
    val sink = new InMemoryUpsertSink
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = RidePipeline.start(metrics, sink, ckpt, Trigger.ProcessingTime(0))
    try {
      source.addData(Seq(rideJson("nyc", t0 + 1, 10.0, "a"), "{not json at all"))
      q.processAllAvailable()
    } finally q.stop()
    // malformed row has null city AND null event_timestamp → no window → excluded
    assert(sink.cityMetrics.keySet == Set("nyc"))
    assert(sink.cityMetrics("nyc").total_trips == 1)
  }
}
