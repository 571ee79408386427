package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: hive-partitioned writes with partition-pruned
  * reads, and bucketed tables whose joins need no exchange at all.
  *
  * These are the two storage-side levers that matter most at 100 TB:
  *
  *  - '''Partition pruning''' turns a predicate on the partition column
  *    into directory listing, not I/O: a reader of one `l_returnflag`
  *    value out of three touches one third of the files — before a single
  *    byte of parquet is opened. At 100 TB with daily date partitions, a
  *    one-week query reads 7/365ths of the corpus. The pruning is visible
  *    in the scan node's `PartitionFilters` (asserted in OperatorSpec —
  *    a plan whose partition predicate degraded to a post-scan `Filter`
  *    is a silent full-corpus read).
  *
  *  - '''Bucketing''' pre-shuffles a table ONCE at write time: both sides
  *    bucketed by the join key into the same bucket count hash-split
  *    their rows identically, so the join is bucket-to-bucket with zero
  *    runtime `Exchange` — the shuffle that dominates a fact-to-fact join
  *    is paid once at ingest and amortized over every subsequent join.
  *    `sortBy` additionally persists the sort, letting sort-merge-join
  *    skip its sorts. OperatorSpec asserts the executed plan contains no
  *    shuffle exchange.
  *
  * The reference keeps everything in a single Kafka topic and one
  * Postgres table (no layout tier at all — SURVEY.md §4.1); this module
  * is the scale path its city-partitioned data model implies
  * (reference partitions by city key only logically, producer/run_producer.py:16-19).
  */
object Layout {

  /** Write `df` hive-partitioned by `partCol` (one directory per value).
    * At scale the caller picks a column whose cardinality matches the
    * desired file count — dates, regions, shards — never a high-card key. */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    graft.sources.Sources.writePartitioned(df, path, Seq(partCol))

  /** Read back one partition by value. The equality predicate lands in
    * `PartitionFilters`: non-matching directories are never listed into
    * the scan, so I/O scales with the selected partition, not the table. */
  def readPartition(spark: SparkSession, path: String, partCol: String,
      value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)

  /** Persist `df` as a bucketed + sorted table (external, parquet).
    * Dropping first keeps the call idempotent under re-runs; the data
    * itself is replaced by mode=overwrite.
    *
    * The pre-write `repartition(nBuckets, key)` aligns the shuffle with
    * the bucket hash (both are Murmur3 pmod nBuckets), so each write
    * task holds exactly one bucket ⇒ ONE file per bucket. Without it,
    * every write task emits a file per bucket it happens to hold —
    * tasks×buckets small files at fleet scale. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * non-negative integer columns — a's bit i lands at position 2i, b's
    * at 2i+1 — so rows close in BOTH dimensions get close keys. Pure
    * shift/and/or arithmetic: one codegen'd projection, no UDF, and any
    * engine can reproduce the key from the same formula.
    *
    * Inputs must already be quantized to [0, 2^bits); the caller maps
    * raw values onto that grid (e.g. `floor(price / width)`). Values
    * outside the grid are CLAMPED to its edges rather than silently
    * aliased: bit-interleaving an out-of-range value would wrap it onto
    * the low end of the curve, scattering far-apart rows into the same
    * files and quietly destroying the 2-D clustering this operator
    * exists for — clamping instead piles the overflow into the last
    * cell, which degrades locally but never corrupts the curve. */
  def zOrderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val top = (1L << bits) - 1L
    def grid(c: Column): Column =
      least(greatest(c.cast("long"), lit(0L)), lit(top))
    val (ga, gb) = (grid(a), grid(b))
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(ga, i).bitwiseAND(1L), 2 * i)
      val bbit = shiftleft(shiftright(gb, i).bitwiseAND(1L), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduceLeft(_ bitwiseOR _)
  }

  /** Write `df` Z-ordered on two quantized dimensions: range-partition by
    * the Morton key into `nFiles` files and sort each file by it, so each
    * file's footer min/max covers a small RECTANGLE of (a, b) space
    * instead of a stripe. A 2-D box predicate then skips every file whose
    * rectangle misses the box — single-column sorting gives that skipping
    * for one dimension only; Z-order gives it for both at once. At 100 TB
    * this is the multi-dimensional clustering pass run once at ingest so
    * every later scan with selective 2-D predicates reads a sliver.
    *
    * The key column is dropped before the write: it is derivable, and
    * keeping the files schema-identical to the source keeps readers
    * oblivious to the layout. */
  def zorderWrite(df: DataFrame, aCol: Column, bCol: Column, bits: Int,
      nFiles: Int, path: String): Unit =
    df.withColumn("__z", zOrderKey(aCol, bCol, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Equi-join two same-bucketed tables. With both sides bucketed by
    * their join key into the same `nBuckets`, Spark plans a sort-merge
    * join with NO exchange on either side (the `merge` hint keeps the
    * small side from being broadcast, which would hide the property this
    * operator exists to demonstrate). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
