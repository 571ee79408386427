package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: dump a query's executed plan (used to shape plan guards). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    val p = df.queryExecution.executedPlan.toString
    println("nGenerate=" + "Generate".r.findAllIn(p).size)
    println("nInMem=" + "InMemoryTableScan".r.findAllIn(p).size)
    println("nFileScan=" + "FileScan".r.findAllIn(p).size)
    println(p.linesIterator.map(_.take(110)).mkString("\n"))
    spark.stop()
  }
}
