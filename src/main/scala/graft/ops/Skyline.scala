package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both dimensions) — the
  * multi-objective selection operator a data-curation pipeline needs
  * when two merits trade off (quality score vs diversity, revenue vs
  * coverage): keep every point no other point beats-or-ties on BOTH
  * axes while strictly beating it on at least one.
  *
  * The textbook formulation is a quadratic NOT-EXISTS self-join (the
  * oracle uses exactly that); this plan is the sort-free distributed
  * form:
  *
  *  1. Collapse the corpus to its distinct x-levels with one keyed
  *     aggregate: (x, max y at x, multiplicity) — the ONLY corpus-sized
  *     exchange. Points below their x-level's max y are dominated within
  *     the level (equal x, strictly smaller y) and never travel further.
  *  2. Range-bucket the x-levels by value (a 1-row min/max broadcast;
  *     any monotone bucketing is correct — balance affects parallelism,
  *     never the answer, so double arithmetic is fine here).
  *  3. Per bucket, a window over the LEVEL frame ordered by x desc
  *     computes the running max y over strictly-greater x (distinct
  *     levels make ROWS 1 PRECEDING exactly "strictly greater").
  *  4. Across buckets, the per-bucket max-y frame (B rows) takes the
  *     same prefix-max — monotone bucketing guarantees every level in a
  *     higher bucket has strictly greater x.
  *  5. A level survives iff its max y strictly exceeds the best y at any
  *     greater x (dominance needs only non-strict y once x is strictly
  *     greater); survivors join back to the corpus keeping y == level
  *     max, so equal-(x,y) ties all survive (neither dominates).
  *
  * Every window runs over a collapsed frame (distinct x-levels per
  * bucket, or B bucket rows) — the corpus itself is never globally
  * sorted and never self-joined. Works for any orderable x/y; exact
  * when x/y are exact types (DECIMAL/integer), which is how the gated
  * query uses it. */
object Skyline {

  /** Rows of `pts` on the maximize-(xCol, yCol) Pareto frontier.
    * `buckets` bounds per-window partition size (pick ~parallelism). */
  def frontier(pts: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets >= 1")
    val x = col(xCol)
    val levels = pts.groupBy(x).agg(max(col(yCol)).as("__my"))
    val rng = broadcast(levels.agg(
      min(x.cast("double")).as("__lo"), max(x.cast("double")).as("__hi")))
    // floor is monotone in x; equal x ⇒ equal bucket; width guarded so a
    // single-level frame maps to bucket 0 instead of dividing by zero.
    val width = greatest(col("__hi") - col("__lo"), lit(1e-300))
    val bucketed = levels.crossJoin(rng)
      .select(x, col("__my"),
        least(floor((x.cast("double") - col("__lo")) / width * buckets),
          lit(buckets - 1)).cast("int").as("__b"))
    val inBucket = Window.partitionBy(col("__b")).orderBy(x.desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val acrossBuckets = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = bucketed.groupBy(col("__b"))
      .agg(max(col("__my")).as("__bm"))
      .select(col("__b"), max(col("__bm")).over(acrossBuckets).as("__pref"))
    val survivors = bucketed
      .withColumn("__run", max(col("__my")).over(inBucket))
      .join(bucketMax, Seq("__b"))
      .filter(col("__my") > coalesce(greatest(col("__run"), col("__pref")),
        lit(Long.MinValue)))
      .select(x.as("__sx"), col("__my")) // renamed: survivors share pts' lineage
    pts.join(survivors,
        col(xCol) === col("__sx") && col(yCol) === col("__my"))
      .select(pts.columns.map(col): _*)
  }
}
