package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each user's event stream into sessions at
  * inactivity gaps — the batch twin of `StreamOps.sessionMetrics`'s
  * streaming session window, for the backfill/replay path (the reference
  * only ever sees the live stream; any reprocessing of history needs this
  * batch form over the same semantics).
  *
  * Shape: one shuffle on the user key, then two window passes over each
  * user's ordered events — `lag` marks rows whose gap from the previous
  * event exceeds the threshold, a running sum of those marks numbers the
  * sessions. Per-user state is a single pass (Spark's window operator
  * buffers one partition key at a time); at 100 TB the operator scales
  * with the fattest single user, not the corpus — the same bound the
  * streaming session-window state store has.
  *
  * Determinism at tied timestamps: the boundary test compares timestamp
  * VALUES, so rows with equal timestamps always land in the same session
  * no matter how the window orders them — exactly one of a tied run
  * crossing a boundary carries the mark, whichever comes first. The
  * outputs (counts, min/max, keyed sums) are therefore order-independent
  * and hash-gate exact.
  */
object Sessionize {

  /** Epoch seconds with fractional microseconds, exact in double (micros
    * since 1970 stay below 2^53 until year ~2255). */
  private def epochS(c: Column): Column = c.cast("double")

  /** One row per (user, session): event count, span, exact value sum.
    * `gapSec`: a new session starts when the gap STRICTLY exceeds it. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapSec: Double): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val run = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(epochS(col(tsCol)), 1).over(byUser)
    val isNew = when(prev.isNull || epochS(col(tsCol)) - prev > gapSec, 1L)
      .otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        // decimal accumulation: fold-order-independent, hash-gate exact.
        // The outer cast pins the DECLARED type to (38,6): Spark's sum
        // over decimal(18,6) yields decimal(28,6) while DuckDB declares
        // (38,6) — same values, but a stricter future hash that mixes in
        // declared precision would diverge. Pinning removes the skew.
        sum(col(valueCol).cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("sum_value"))
  }
}
