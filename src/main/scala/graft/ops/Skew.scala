package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. AQE's skew-join splitting covers
  * sort-merge joins at runtime; these helpers cover the cases AQE doesn't:
  * a replicated ("salted") broadcast-free join against a modest dim when
  * one probe key dominates, and two-phase aggregation when a single group
  * would bottleneck the final reducer.
  *
  * Join results and counts are identical to the unsalted plan — salting
  * only changes the shuffle layout. Floating-point SUMs are a different
  * story: two-phase summation changes the IEEE-754 fold order, so double
  * sums would only be approximately equal. `saltedCountSum` therefore
  * accumulates sums in DECIMAL(38,6) (exact, order-independent) and casts
  * the final result back to double — bit-identical to any other exact
  * accumulation of the same values, salted or not. */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of the given columns.
    * Use row-identifying columns so the hot key's rows spread evenly. */
  def saltOf(salts: Int, cols: Column*): Column = pmod(hash(cols: _*), lit(salts))

  /** Equi-join where the big (possibly skewed) side is salted and the
    * small side is replicated `salts`× — each (key, salt) bucket joins
    * independently, so a hot key spreads over `salts` reducers instead of
    * one. Output = plain inner join on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      bigIdCols: Seq[String]): DataFrame = {
    val salted = big.withColumn("__salt", saltOf(salts, bigIdCols.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial count/sum per (key, salt),
    * then combine per key. The partial shuffle spreads a hot group across
    * `salts` partitions; the final shuffle moves only `salts` rows per
    * group. Equivalent to groupBy(key).agg(count, sum) — exactly: the sum
    * accumulates in DECIMAL(38,6), so the result does not depend on the
    * fold order the salting introduces. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, salts: Int,
      idCols: Seq[String]): DataFrame =
    df.withColumn("__salt", saltOf(salts, idCols.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(38,6)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast("double").as("sum_value"))
}
