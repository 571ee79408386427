package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what an optimization actually moves: total shuffle-write
  * bytes/records of a query, via a stage-completion listener. Used to
  * quantify the bloom semi-join prefilter against the plain semi join at
  * sf0.1 with broadcasting disabled (the regime the operator exists for:
  * a dim too big to broadcast but cheap to bloom). Results recorded in
  * SCALE.md. `sbt "runMain graft.tools.ShuffleProbe [sfDir]"`. */
object ShuffleProbe {
  private class Acc extends SparkListener {
    @volatile var bytes = 0L
    @volatile var records = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")

    def measure(name: String)(df: => DataFrame): Unit = {
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      df.write.format("noop").mode("overwrite").save()
      spark.sparkContext.removeSparkListener(acc)
      println(f"$name%-12s shuffle ${acc.records}%9d records  ${acc.bytes}%10d bytes")
    }

    measure("plain") {
      orders.join(dim.select(col("c_custkey").as("o_custkey")).distinct(),
        Seq("o_custkey"), "semi")
    }
    measure("bloom") {
      graft.ops.BloomJoin.bloomSemiJoin(orders, "o_custkey", dim, "c_custkey",
        expectedItems = 100000)
    }
    spark.stop()
  }
}
