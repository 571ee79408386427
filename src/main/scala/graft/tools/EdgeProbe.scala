package graft.tools
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Offline timing probe for the shared graph edge builds — NOT part of the
  * gated surface. Times each stage of coPurchaseEdges at the given SF so
  * optimization targets the measured cost, not a guess. */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .appName("edgeprobe").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      // warm once, then min of 3
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime; val n = f; (System.nanoTime - t0) / 1e9 }
      println(f"$tag%-28s min=${ts.min}%.3f s  (${ts.mkString(", ")})")
    }
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    time("scan lineitem")(li.count())
    val g1 = li.groupBy(col("ok"), col("pk")).agg(count(lit(1)).as("c"))
    time("g1 (ok,pk) agg")(g1.count())
    val g2 = g1.groupBy(col("ok"))
      .agg(sort_array(collect_list(struct(col("pk"), col("c")))).as("ps"))
      .filter(size(col("ps")) >= 2)
    time("g2 collect_list")(g2.count())
    val ps = col("ps")
    val pairs = flatten(transform(sequence(lit(1), size(ps) - 1), i =>
      transform(slice(ps, lit(1), i), x =>
        struct(x("pk").as("a"), element_at(ps, i + 1)("pk").as("b"),
          (x("c") * element_at(ps, i + 1)("c")).as("w")))))
    val ex = g2.select(explode(pairs).as("p"))
    time("explode pairs")(ex.count())
    val agg = ex.groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("p.w")).as("__n")).filter(col("__n") >= 2)
      .select(col("a"), col("b"))
    time("full edge build")(agg.count())
    time("edges via SparkEntry")(graft.SparkEntry.coPurchaseEdges(s, dir).count())

    // Candidate: ONE shuffle — group straight to the per-order sorted
    // part list (duplicates kept) and emit strict ps[i]<ps[j] occurrence
    // pairs, weight 1 each. For a<b in a sorted-with-duplicates array
    // every occurrence of a precedes every occurrence of b, so the
    // per-order pair count is cnt(a)*cnt(b) — the same weight the
    // two-level build attaches explicitly.
    val f1 = li.groupBy(col("ok"))
      .agg(sort_array(collect_list(col("pk"))).as("ps"))
      .filter(size(ps) >= 2)
    val fpairs = flatten(transform(sequence(lit(1), size(ps) - 1), i =>
      transform(slice(ps, lit(1), i), x =>
        struct(x.as("a"), element_at(ps, i + 1).as("b")))))
    val fused = f1.select(explode(fpairs).as("p"))
      .filter(col("p.a") < col("p.b"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col("a"), col("b"))
    time("fused edge build")(fused.count())
    val old = graft.SparkEntry.coPurchaseEdges(s, dir)
    val diff = fused.unionAll(old).groupBy("a", "b").agg(count(lit(1)).as("k"))
      .filter(col("k") =!= 2).count()
    println(s"symmetric diff vs current build: $diff (must be 0)")

    // tradePairs: orders ⋈ lineitem on orderkey → distinct (cust, supp)
    val ords = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val lis = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    def tp(o: DataFrame): Long =
      o.join(lis, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("su"))
        .distinct().count()
    time("tradePairs as-is")(tp(ords))
    time("tradePairs bcast orders")(tp(broadcast(ords)))
    s.stop()
  }
}
