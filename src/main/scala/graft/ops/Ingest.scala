package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion stages — composable `DataFrame => DataFrame` transforms that
  * work identically on batch and streaming frames (the plan below a
  * `StreamingRelation` is the same Catalyst plan).
  *
  * Reproduces the reference's consume path (spark_jobs/streaming_job.py:
  * 107-111): binary Kafka `value` → string → `from_json` against a declared
  * schema → star-expand → epoch-double → timestamp cast. All stages are
  * built-in codegen'd expressions (JsonToStructs, Cast) — no UDFs.
  */
object Ingest {

  /** P1+P2: parse a raw payload column as JSON against `schema` and flatten
    * the resulting struct. Malformed rows yield null fields (PERMISSIVE —
    * the from_json default, matching the reference). */
  def parseJson(schema: StructType, payloadCol: String = "value")(df: DataFrame): DataFrame =
    df.select(from_json(col(payloadCol).cast(StringType), schema).as("data"))
      .select(col("data.*"))

  /** P3: epoch-seconds double → event-time timestamp, in place. */
  def castEventTime(timeCol: String = "event_timestamp")(df: DataFrame): DataFrame =
    df.withColumn(timeCol, col(timeCol).cast(TimestampType))

  /** S3 (producer direction): struct-pack every column and serialize to a
    * JSON string payload, the shape a Kafka sink would publish. */
  def toJsonPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  /** The full consume path as one stage. */
  def consume(schema: StructType, timeCol: String = "event_timestamp")(df: DataFrame): DataFrame =
    castEventTime(timeCol)(parseJson(schema)(df))
}
