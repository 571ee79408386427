package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline micro-probe (NOT part of the gated surface): where does the
  * ~0.7 s of a single keyed aggregate over the sf0.1 lineitem scan go?
  * Sweeps the candidate fixed-cost knobs (AQE on/off, shuffle partition
  * count, in-memory columnar cache) so the r15 optimization round
  * attacks the measured component, not a guess.
  * `sbt "runMain graft.tools.AggProbe [sfDir]"`. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def session(aqe: Boolean, parts: Int): SparkSession = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .appName(s"aggprobe-$aqe-$parts")
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    def time(tag: String)(f: => Long): Unit = {
      f
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"$tag%-44s min=${ts.min}%.3f s")
    }
    for (aqe <- Seq(true, false); parts <- Seq(32, 8, 64)) {
      val s = session(aqe, parts)
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      time(s"aqe=$aqe parts=$parts  groupBy(ok,pk).count")(
        li.groupBy(col("ok"), col("pk")).agg(count(lit(1))).count())
      time(s"aqe=$aqe parts=$parts  groupBy(ok) collect")(
        li.groupBy(col("ok"))
          .agg(sort_array(collect_list(col("pk"))).as("ps"))
          .filter(size(col("ps")) >= 2).count())
      s.stop()
    }
  }
}
