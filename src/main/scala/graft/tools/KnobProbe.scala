package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the sizing dials of the bounded graph-centrality family —
  * wall time of `betweennessBounded` vs SEED COUNT (depth fixed at the
  * gated 3) and of `closenessBounded` vs BFS ROUNDS — over the sf0.1
  * co-purchase graph, so the SCALE.md knob table is measured, not
  * argued. Each point runs cold (cache cleared) like the bench
  * protocol. `sbt "runMain graft.tools.KnobProbe [sfDir]"`. */
object KnobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Long): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val nodes = graft.SparkEntry.coPurchaseEdges(spark, sfDir)
      .select(col("a").as("node"))
      .unionAll(graft.SparkEntry.coPurchaseEdges(spark, sfDir)
        .select(col("b").as("node"))).distinct()
    // seed dial: node % m == 0 sweeps the sampled-seed count
    for (m <- Seq(97, 29, 7, 2)) {
      val seeds = nodes.filter(col("node") % m === 0)
      val n = seeds.count()
      val sec = timed(graft.ops.Graph.betweennessBounded(
        graft.SparkEntry.coPurchaseEdges(spark, sfDir),
        seeds).count())
      println(f"betweenness seeds=$n%d depth=3 -> $sec%.1f s")
    }
    // depth dial: closeness shares perSeedDistances, the cost driver
    for (r <- Seq(2, 3, 4)) {
      val seeds = nodes.filter(col("node") % 97 === 0)
      val sec = timed(graft.ops.Graph.closenessBounded(
        graft.SparkEntry.coPurchaseEdges(spark, sfDir),
        seeds, rounds = r).count())
      println(f"closeness seeds=200ish rounds=$r%d -> $sec%.1f s")
    }
    // two-level rank vs the single global window, at a row count where
    // the single task actually hurts (the sf0.1 fixtures are too small
    // to show it): 10M synthetic rows, rank over (v, id) with v tied
    // 1000 ways — the fixture-scale gates prove VALUES equal; this
    // measures the wall-time gap the formulation exists for
    val n = 10_000_000L
    def synth = spark.range(n).select(col("id"),
      (col("id") % 1000).as("v"), (col("id") % 7).as("w"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("id"))
    val tGlobal = timed(synth
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(w))
      .agg(sum(col("r"))).collect().head.getLong(0))
    val tTwo = timed(graft.ops.TwoLevelRank
      .rank(synth, Nil, Seq("v"), expr("id div 65536"), Seq("id"), "r")
      .agg(sum(col("r"))).collect().head.getLong(0))
    println(f"rank 10M rows: global window $tGlobal%.1f s, two-level $tTwo%.1f s")
    // hot-class variant (the sample_quality_quota claim): per-lang rank
    // where one language holds 90% of rows — a plain PARTITION BY lang
    // window serializes the hot language through one task
    def synthLang = spark.range(n).select(col("id"),
      when(col("id") % 10 < 9, lit("en")).otherwise(lit("de")).as("lang"),
      (col("id") % 1000).as("v"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("v"), col("id"))
    val tHot = timed(synthLang
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(wl))
      .agg(sum(col("r"))).collect().head.getLong(0))
    val tHot2 = timed(graft.ops.TwoLevelRank
      .rank(synthLang, Seq("lang"), Seq("v"), expr("id div 65536"),
        Seq("id"), "r")
      .agg(sum(col("r"))).collect().head.getLong(0))
    println(f"per-lang rank 10M rows (90%% one lang): partitioned window $tHot%.1f s, two-level $tHot2%.1f s")
    spark.stop()
  }
}
