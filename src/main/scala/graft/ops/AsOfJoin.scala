package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to every left row the LATEST right row with
  * the same key and time <= the left row's time (inclusive) — the
  * time-series/feature-lookup operator (quotes-to-trades, last-sensor-
  * reading, attribution). Spark has no built-in as-of join; the naive
  * formulations are a range theta-join (quadratic per key) or a per-row
  * probe (driver loop). This one is the scale shape:
  *
  *   union(tagged left, tagged right)            — no shuffle yet
  *   -> hash-partition by key, sort by (time, side)  — ONE shuffle
  *   -> running `last(right_payload, ignoreNulls)` over the ordered
  *      window carries the latest right payload forward in a single pass
  *   -> keep left rows, unpack payload
  *
  * Cost is O(|L|+|R|) rows through one exchange + sort, independent of
  * match distance — the same plan at 100 TB. A hot key skews the window
  * partition exactly like any window function; salt upstream if one key
  * dominates (windows can't split a partition mid-key).
  *
  * Right rows must be unique per (key, time) — pre-aggregate the right
  * side if not (otherwise "the" row at a timestamp is ill-defined; both
  * this impl and DuckDB's ASOF would pick arbitrarily).
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach; emitted as
    *                    `asof_<name>`, plus `asof_time` = matched right
    *                    row's time. Unmatched left rows get nulls.
    * @param toleranceSec optional max lookback in seconds: matches older
    *                     than `left.time - tolerance` are nulled out. */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftTagged = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"))
    val rightTagged = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct((col(timeCol).as("__rt") +: payloadCols.map(col)): _*).as("__rv"))
    // allowMissingColumns fills __rv on the left / __lrow on the right
    // with typed nulls — exactly the carrier shape the window pass needs
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // At equal times the right row sorts first (side 0 < 1): inclusive
    // t_right <= t_left, matching ASOF `ON l.t >= r.t` semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(tol) => matched.withColumn("__m",
        when(unix_micros(col("__t")) - unix_micros(col("__m.__rt")) <= (tol * 1e6).toLong,
          col("__m")))
      case None => matched
    }
    bounded.select(
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        (col("__m.__rt").as("asof_time") +:
          payloadCols.map(p => col(s"__m.$p").as(s"asof_$p"))): _*)
  }

  /** Forward as-of join: the EARLIEST right row with time >= the left
    * row's time (inclusive) — "next maintenance after the failure",
    * "next quote after the order". The mirror of [[asOfBackward]] on the
    * SAME single-exchange plan: left rows sort before right rows at
    * equal times (side 0 < 1, keeping the inclusive match in frame) and
    * the carrier is `first(right_payload, ignoreNulls)` over the
    * forward frame instead of `last` over the backward one. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      toleranceSec: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftTagged = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"))
    val rightTagged = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct((col(timeCol).as("__rt") +: payloadCols.map(col)): _*).as("__rv"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__m", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val bounded = toleranceSec match {
      case Some(tol) => matched.withColumn("__m",
        when(unix_micros(col("__m.__rt")) - unix_micros(col("__t")) <= (tol * 1e6).toLong,
          col("__m")))
      case None => matched
    }
    bounded.select(
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        (col("__m.__rt").as("asof_time") +:
          payloadCols.map(p => col(s"__m.$p").as(s"asof_$p"))): _*)
  }

  /** Nearest as-of join: the right row minimizing |t_right − t_left| per
    * key, ties to the BACKWARD match (pandas merge_asof
    * direction='nearest' convention) — "closest sensor reading to the
    * incident". Same single-exchange plan as the directional forms:
    * both carriers ride ONE window pass (the backward `last` and the
    * forward `first` share the (key) partitioning and (time, side)
    * order, so Catalyst hosts them in one WindowExec over one sort),
    * then the pick is per-row arithmetic on the two candidate times.
    * A right row at exactly t_left is captured by the backward carrier
    * (distance 0 — always wins), so the forward frame's equal-time
    * exclusion is immaterial. Output adds `asof_dir`
    * ('backward'/'forward', null when unmatched). */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftTagged = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"))
    val rightTagged = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      struct((col(timeCol).as("__rt") +: payloadCols.map(col)): _*).as("__rv"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val ord = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__rv"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val db = unix_micros(col("__t")) - unix_micros(col("__b.__rt"))
    val df = unix_micros(col("__f.__rt")) - unix_micros(col("__t"))
    val useBack = col("__b").isNotNull && (col("__f").isNull || db <= df)
    matched
      .withColumn("__m", when(useBack, col("__b")).otherwise(col("__f")))
      .withColumn("asof_dir", when(col("__m").isNull, lit(null).cast("string"))
        .otherwise(when(useBack, lit("backward")).otherwise(lit("forward"))))
      .select(
        leftCols.map(c => col(s"__lrow.$c").as(c)) ++
          (col("__m.__rt").as("asof_time") +:
            payloadCols.map(p => col(s"__m.$p").as(s"asof_$p"))) :+
          col("asof_dir"): _*)
  }
}
