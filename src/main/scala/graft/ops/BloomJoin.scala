package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` over a pre-built bloom filter carried as ONE
  * reference object inside the expression (the same plan-size argument as
  * the codebook expressions in functions/VectorExpressions.scala): the
  * filter ships to executors once per stage via the task binary, the
  * plan string stays O(1) whatever the filter size, and the probe runs
  * inside whole-stage codegen. No false negatives by construction. */
case class MightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $ref.mightContainLong($key);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bloom-prefiltered joins: the standard shuffle-bytes reduction for a
  * selective join at 100 TB.
  *
  * A plain semi/inner join of a 100 TB fact against a selective dim
  * shuffles EVERY fact row on the join key, even though most rows match
  * nothing. `bloomSemiJoin` builds a bloom filter over the dim keys (one
  * pass over the small side, fixed memory, driver-side via
  * `stat.bloomFilter`), probes it in a codegen'd scan-side filter — so
  * the (1 - selectivity)·(1 - fpp) fraction of fact rows that cannot
  * match die BEFORE the exchange — then runs the exact join to remove
  * the fpp false positives. Correctness is unchanged (bloom filters have
  * no false negatives); only bytes-shuffled changes. Spark's own runtime
  * bloom-filter rewrite does this opportunistically; this operator makes
  * it explicit, sized by the caller who knows the dim cardinality. */
object BloomJoin {
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def mightContain(key: Column, filter: BloomFilter): Column =
    c(MightContainLong(e(key), filter))

  /** Exact semi join of `big` on `bigKey` against `small`'s `smallKey`,
    * with the bloom prefilter applied below `big`'s exchange. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.filter(mightContain(col(bigKey).cast("long"), bloom))
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "semi")
  }
}
