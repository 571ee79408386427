package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for a comma-separated list of SparkEntry
  * queries to `<outDir>/<query>_<suffix>.txt` — the per-change plan
  * receipts the optimization rounds commit under plans/r<N>/.
  * `sbt "runMain graft.tools.PlanDump <q1,q2,…> <outDir> <suffix> [sfDir]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan =
        try graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        finally spark.catalog.clearCache()
      // control bytes render as escapes (the Explain.scala lesson)
      val text = plan.map {
        case c if c == '\n' || c == '\t' || c >= ' ' => c.toString
        case c => f"\\x${c.toInt}%02x"
      }.mkString
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), text)
      println(s"wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
