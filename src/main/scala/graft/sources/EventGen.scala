package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** n structured ride events at `eventsPerSecond`, starting at
    * `startEpochS` (default 2024-01-01 00:00:00 UTC). `startId` offsets
    * the id range so a caller can generate a long stream in contiguous
    * time slices (event i is identical whether generated in one call or
    * sliced). */
  def rideEvents(spark: SparkSession, n: Long,
      startEpochS: Double = 1704067200.0,
      eventsPerSecond: Double = 1000.0,
      startId: Long = 0L): DataFrame =
    spark.range(startId, startId + n).select(
      col("id").cast("string").as("trip_id"),
      element_at(lit(cities.toArray), pmod(col("id"), lit(cities.length)).cast("int") + 1).as("city"),
      (u01(1) * 145.0 + 5.0).as("fare_amount"),
      (lit(startEpochS) + col("id") / eventsPerSecond).as("event_timestamp"))

  /** The same events serialized to the JSON wire shape the streaming
    * pipeline consumes (reference: producer publishes JSON to Kafka). */
  def rideEventsJson(spark: SparkSession, n: Long,
      startEpochS: Double = 1704067200.0,
      eventsPerSecond: Double = 1000.0,
      startId: Long = 0L): DataFrame =
    rideEvents(spark, n, startEpochS, eventsPerSecond, startId)
      .select(to_json(struct(col("trip_id"), col("city"), col("fare_amount"),
        col("event_timestamp"))).as("value"))
}
