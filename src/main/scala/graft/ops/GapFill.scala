package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill (LOCF) — the time-series
  * densification step (sensor rollups, feature snapshots, "state as of
  * hour H" tables): bucket observations onto a fixed grid, materialize
  * EVERY bucket in each key's observed span, and carry the last
  * observation forward across the gaps.
  *
  * The naive per-row formulation ("for each grid cell, find the latest
  * earlier observation") is a backward as-of join of grid × observations;
  * this implementation gets the same result from one ordered window pass,
  * because after the grid join the carried value is just
  * `last(v, ignoreNulls)` over (key, bucket asc).
  *
  * Shape: per-(key,bucket) pre-aggregation (one shuffle, map-side
  * combined) → per-key span aggregation (tiny) → grid explode
  * (sequence(b0, b1): rows generated distributedly, span/bucketWidth per
  * key — the density knob) → left join observations on (key, bucket)
  * (one shuffle) → per-key ordered window (one shuffle). Everything is
  * linear in grid + observation rows; a key's grid lives in one window
  * partition, so a single key spanning years at second granularity
  * should be bucketed coarser or split — the standard window-skew
  * caveat.
  *
  * In-bucket collision policy: `max` (deterministic whatever the row
  * order); pre-aggregate upstream for other semantics. The first bucket
  * of every key is an observation by construction (the span starts at
  * one), so `value_filled` is never null.
  */
object GapFill {

  /** @return one row per (key, grid bucket): (keyCol, bucket,
    *         value_filled, is_gap), bucket = floor(epoch_millis /
    *         (bucketSeconds·1000)). */
  def fillForward(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    val w = bucketSeconds * 1000L
    val obs = df.select(col(keyCol).as("__k"),
        expr(s"unix_millis(`$timeCol`) div ${w}L").as("bucket"),
        col(valueCol).as("__v"))
      .groupBy(col("__k"), col("bucket")).agg(max(col("__v")).as("__v"))
    val grid = obs.groupBy(col("__k"))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col("__k"), explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val win = Window.partitionBy(col("__k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("__k", "bucket"), "left")
      .select(col("__k").as(keyCol), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(win).as("value_filled"),
        col("__v").isNull.as("is_gap"))
  }

  /** Linear interpolation over the same grid: a gap bucket gets
    * prev + (next − prev) · (b − b_prev)/(b_next − b_prev) between its
    * nearest observations. Same plan shape as [[fillForward]] plus one
    * extra window direction: the forward pass carries (b_prev, v_prev),
    * the backward frame of the SAME per-key ordered exchange carries
    * (b_next, v_next) — one shuffle total, two frames. The grid starts
    * and ends on observations by construction, so both neighbors always
    * exist and the interpolant is total. The weight is a ratio of exact
    * small integers; the interpolation is four IEEE ops — deterministic
    * on any engine and any partitioning. */
  def interpolateLinear(df: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    val w = bucketSeconds * 1000L
    val obs = df.select(col(keyCol).as("__k"),
        expr(s"unix_millis(`$timeCol`) div ${w}L").as("bucket"),
        col(valueCol).as("__v"))
      .groupBy(col("__k"), col("bucket")).agg(max(col("__v")).as("__v"))
    val grid = obs.groupBy(col("__k"))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col("__k"), explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val ord = Window.partitionBy(col("__k")).orderBy(col("bucket"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(obs, Seq("__k", "bucket"), "left")
      .withColumn("__pb", last(when(col("__v").isNotNull, col("bucket")),
        ignoreNulls = true).over(back))
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__nb", first(when(col("__v").isNotNull, col("bucket")),
        ignoreNulls = true).over(fwd))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(fwd))
      .select(col("__k").as(keyCol), col("bucket"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (col("bucket") - col("__pb")) / (col("__nb") - col("__pb")))
          .as("value_interp"),
        col("__v").isNull.as("is_gap"))
  }
}
