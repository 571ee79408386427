package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standalone deterministic ride-event generator — the engine's analog of
  * the reference's producer loop (reference: producer/run_producer.py:21-47:
  * random city from a fixed list, uniform fare in [5, 150), wall-clock
  * timestamps), re-expressed as a distributed `spark.range` projection so
  * load generation scales with the cluster instead of a driver loop.
  *
  * Deterministic BY CONSTRUCTION and independent of partitioning: every
  * column derives from `id` via hash arithmetic, never `rand()` (whose
  * output depends on the partition layout, so a repartitioned run would
  * generate different data). Row i is identical whatever the parallelism.
  */
object EventGen {

  val cities: Seq[String] =
    Seq("nyc", "sf", "la", "chi", "mia", "bos", "sea", "den", "atl", "dal")

  /** Uniform-ish [0, 1) double derived from (id, salt) — xxhash64 folded
    * into 6 decimal digits; plenty for load-generation distributions. */
  private def u01(salt: Int) =
    pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)) / 1000000.0

  /** Deterministic UUID-shaped string from (id, salt): 32 hex digits from
    * two xxhash64 draws, formatted 8-4-4-4-12 (the reference's ids are
    * uuid4 strings, run_producer.py:30-32). */
  private def uuidish(salt: Int): Column = {
    val h1 = lpad(lower(hex(xxhash64(col("id"), lit(salt)))), 16, "0")
    val h2 = lpad(lower(hex(xxhash64(col("id"), lit(salt + 1000)))), 16, "0")
    concat(
      substring(h1, 1, 8), lit("-"), substring(h1, 9, 4), lit("-"),
      substring(h1, 13, 4), lit("-"), substring(h2, 1, 4), lit("-"),
      substring(h2, 5, 12))
  }

  /** "±dd.dddddd" coordinate string (the reference serializes lat/lon as
    * strings, run_producer.py:33-40). */
  private def coord(salt: Int, span: Double, offset: Double): Column =
    format_string("%.6f", u01(salt) * span - offset)

  private val isoFmt = "yyyy-MM-dd'T'HH:mm:ss"

  /** n structured ride events at `eventsPerSecond`, starting at
    * `startEpochS` (default 2024-01-01 00:00:00 UTC), in the reference
    * producer's FULL 11-field wire shape (run_producer.py:29-47): uuid
    * trip/driver/customer ids, ISO pickup/dropoff datetimes (trip duration
    * uniform in [300, 3600] s, dropoff = event time), nested lat/lon
    * string structs, 2-dp fare and tip, city, epoch-seconds double.
    * `startId` offsets the id range so a caller can generate a long stream
    * in contiguous time slices (event i is identical whether generated in
    * one call or sliced). */
  def rideEvents(spark: SparkSession, n: Long,
      startEpochS: Double = 1704067200.0,
      eventsPerSecond: Double = 1000.0,
      startId: Long = 0L): DataFrame = {
    val eventTs = lit(startEpochS) + col("id") / eventsPerSecond
    val durationS = floor(u01(2) * 3301.0) + 300L
    spark.range(startId, startId + n).select(
      uuidish(10).as("trip_id"),
      uuidish(20).as("driver_id"),
      uuidish(30).as("customer_id"),
      date_format(timestamp_seconds(eventTs - durationS), isoFmt).as("pickup_datetime"),
      date_format(timestamp_seconds(eventTs), isoFmt).as("dropoff_datetime"),
      struct(coord(3, 180.0, 90.0).as("latitude"),
        coord(4, 360.0, 180.0).as("longitude")).as("pickup_location"),
      struct(coord(5, 180.0, 90.0).as("latitude"),
        coord(6, 360.0, 180.0).as("longitude")).as("dropoff_location"),
      round(u01(1) * 145.0 + 5.0, 2).as("fare_amount"),
      round(u01(7) * 50.0, 2).as("tip_amount"),
      element_at(lit(cities.toArray), pmod(col("id"), lit(cities.length)).cast("int") + 1).as("city"),
      eventTs.as("event_timestamp"))
  }

  /** The same events serialized to the JSON wire shape the streaming
    * pipeline consumes (reference: producer publishes JSON to Kafka) —
    * all 11 fields, so the consumer's nested-struct parse path is
    * exercised under load, not just in unit fixtures. */
  def rideEventsJson(spark: SparkSession, n: Long,
      startEpochS: Double = 1704067200.0,
      eventsPerSecond: Double = 1000.0,
      startId: Long = 0L): DataFrame = {
    val e = rideEvents(spark, n, startEpochS, eventsPerSecond, startId)
    e.select(to_json(struct(e.columns.map(col): _*)).as("value"))
  }
}
