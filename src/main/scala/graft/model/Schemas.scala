package graft.model

import org.apache.spark.sql.types._

/** Data model of the engine.
  *
  * The ride-event wire schema reproduces the reference's declared consumer
  * schema (reference: spark_jobs/streaming_job.py:78-96) and the producer's
  * actual payload shape (reference: producer/run_producer.py:29-47). The
  * sink contract mirrors infra/init.sql:2-7.
  */
object Schemas {

  /** Nested lat/lon struct — stringified decimals on the wire
    * (reference: producer/run_producer.py:35-42, streaming_job.py:84-91). */
  val locationSchema: StructType = StructType(Seq(
    StructField("latitude", StringType, nullable = true),
    StructField("longitude", StringType, nullable = true),
  ))

  /** Declared schema of one trip event JSON payload
    * (reference: spark_jobs/streaming_job.py:78-96). All fields nullable. */
  val rideEventSchema: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = true),
    StructField("driver_id", StringType, nullable = true),
    StructField("customer_id", StringType, nullable = true),
    StructField("pickup_datetime", StringType, nullable = true),
    StructField("dropoff_datetime", StringType, nullable = true),
    StructField("pickup_location", locationSchema, nullable = true),
    StructField("dropoff_location", locationSchema, nullable = true),
    StructField("fare_amount", DoubleType, nullable = true),
    StructField("tip_amount", DoubleType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("event_timestamp", DoubleType, nullable = true),
  ))
}

/** Typed form of the parsed trip event (post `from_json`, pre event-time
  * cast). Timestamps arrive as epoch-seconds doubles on the wire
  * (reference: producer/run_producer.py:46). */
case class TripEvent(
    trip_id: String,
    driver_id: String,
    customer_id: String,
    pickup_datetime: String,
    dropoff_datetime: String,
    fare_amount: Option[Double],
    tip_amount: Option[Double],
    city: String,
    event_timestamp: Double)

/** One row of the per-city metrics sink (reference: infra/init.sql:2-7).
  * `averageFare` stays Double in-engine; NUMERIC(10,2) quantization is a
  * sink-boundary concern only (SURVEY.md §2.6.3). */
case class CityMetric(
    city: String,
    total_trips: Long,
    average_fare: Double,
    last_updated: java.sql.Timestamp)
