package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every point row with every interval
  * row whose [lo, hi] (inclusive both ends) contains the point. The
  * reference surface has no joins at all (SURVEY.md §2.5) — this is
  * extension-surface headroom for the time-range shapes Spark itself has
  * no native strategy for: a raw `p BETWEEN lo AND hi` theta-join plans
  * as BroadcastNestedLoopJoin (all-pairs per partition), which is
  * quadratic and dies long before 100 TB.
  *
  * The scale shape is bucket expansion (the same trick behind
  * production range-join optimizers): quantize the position axis into
  * fixed-width buckets,
  *
  *   points:    bucket = floorDiv(p, W)                  — 1 row each
  *   intervals: explode buckets floorDiv(lo,W)..floorDiv(hi,W)
  *              — ceil(len/W)+1 rows each, LINEAR in interval length
  *   equi-join on bucket  (hash shuffle both sides, partition-parallel)
  *   residual `p BETWEEN lo AND hi` kills same-bucket non-matches
  *
  * Each matching pair is emitted exactly once — the point lives in
  * exactly one bucket, and that bucket appears exactly once in its
  * interval's expansion. Cost: |P| + Σ ceil(len_i/W) exchanged rows and
  * ordinary hash-join probes; no nested-loop anywhere (pinned by an
  * OperatorSpec plan assertion). Pick W near the median interval length:
  * W too small inflates the interval-side expansion, W too large turns
  * the residual filter into the all-pairs scan this exists to avoid.
  * Skew: a bucket only gets hot if many intervals overlap the same
  * window AND many points land there — AQE skew-join splits it, since
  * this is a plain shuffled equi-join.
  */
object RangeJoin {

  /** Exact floor division as pure integer arithmetic (codegen'd; no
    * double rounding at any magnitude, correct for negative positions:
    * `%` truncates toward zero, the double-pmod folds it positive). */
  private def bucketOf(posCol: String, w: Long): Column =
    expr(s"(`$posCol` - ((`$posCol` % ${w}L) + ${w}L) % ${w}L) div ${w}L")

  /** Interval-overlap join: pair every left interval with every right
    * interval it overlaps (inclusive ends: a.lo <= b.hi AND b.lo <= a.hi).
    * Same bucket expansion on BOTH sides; an overlapping pair shares
    * every bucket their intersection covers, so to emit it exactly once
    * the residual keeps only the CANONICAL bucket — the bucket containing
    * max(a.lo, b.lo), the intersection's left edge. One arithmetic
    * predicate instead of a distinct pass: no second shuffle.
    *
    * Left/right column names must be disjoint. Cost is as for
    * [[pointInInterval]] with both sides expanded. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftLo: String, leftHi: String, rightLo: String, rightHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"left/right column name clash: $clash")
    val l = left.withColumn("__l_bucket",
      explode(sequence(bucketOf(leftLo, bucketWidth), bucketOf(leftHi, bucketWidth))))
    val r = right.withColumn("__r_bucket",
      explode(sequence(bucketOf(rightLo, bucketWidth), bucketOf(rightHi, bucketWidth))))
    val lo = greatest(col(leftLo), col(rightLo))
    // exact: the numerator is an exact multiple of the width, and double
    // division of exact multiples ≤ 2^53 (any realistic epoch position)
    // yields the exact integer quotient before the cast
    val canonical = (lo - ((lo % bucketWidth) + bucketWidth) % bucketWidth) / bucketWidth
    l.join(r,
        col("__l_bucket") === col("__r_bucket") &&
          col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
          col("__l_bucket") === canonical.cast("long"))
      .drop("__l_bucket", "__r_bucket")
  }

  /** @param points    one row per point; `pointCol` is a LONG position
    *                  (map timestamps via unix_micros/datediff upstream)
    * @param intervals one row per interval; `loCol`/`hiCol` LONG
    *                  positions, lo <= hi, both ends inclusive
    * @param bucketWidth bucket width in position units (> 0)
    * @return all point columns ++ all interval columns (names must be
    *         disjoint) for each containing (point, interval) pair. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column name clash: $clash")

    val p = points.withColumn("__p_bucket", bucketOf(pointCol, bucketWidth))
    val iv = intervals.withColumn("__i_bucket",
      explode(sequence(bucketOf(loCol, bucketWidth), bucketOf(hiCol, bucketWidth))))
    p.join(iv,
        col("__p_bucket") === col("__i_bucket") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__p_bucket", "__i_bucket")
  }

  /** Numeric band self/two-table join: pair rows with |x − y| ≤ width —
    * the value-similarity member of the inequality-join family (record
    * matching on near-equal amounts, sensor alignment on near-equal
    * readings). A raw |x−y|≤w theta-join plans as a nested loop; the
    * scale shape quantizes both sides onto width-sized buckets and
    * equi-joins each left bucket against {b−1, b, b+1} (a band match
    * cannot span further), residual-filtering the exact predicate.
    * Cost: 3 hash-join probes per row, partition-parallel, no
    * nested-loop anywhere. Each pair emits once: the right row's bucket
    * is unique, and it appears once in the left row's 3-bucket fan. */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, width: Double): DataFrame = {
    require(width > 0, "width must be > 0")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"left/right column name clash: $clash")
    // floor of one IEEE division — deterministic and engine-identical
    // on the same doubles
    def bucket(c: String) = floor(col(c) / width).cast("long")
    val l = left.withColumn("__lb", bucket(leftVal))
    val r = right.withColumn("__rb",
      explode(sequence(bucket(rightVal) - 1, bucket(rightVal) + 1)))
    l.join(r, col("__lb") === col("__rb") &&
        abs(col(leftVal) - col(rightVal)) <= width)
      .drop("__lb", "__rb")
  }
}
