package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BigramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).appName("bp").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
      println(f"$tag%-22s min=${ts.min}%.3f s")
    }
    val toks = col("__toks")
    val oldPairs = transform(sequence(lit(0), size(toks) - 2),
      i => struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2")))
    val newPairs = arrays_zip(
        slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1))
      .cast("array<struct<w1:string,w2:string>>")
    val base = docs.select(split(trim(col("text")), "\\s+").as("__toks")).filter(size(toks) >= 2)
    time("old transform pairs")(base.select(explode(oldPairs).as("p"))
      .groupBy(col("p.w1"), col("p.w2")).count().count())
    time("new zip pairs")(base.select(explode(newPairs).as("p"))
      .groupBy(col("p.w1"), col("p.w2")).count().count())
    // equivalence
    val a = base.select(explode(oldPairs).as("p")).groupBy(col("p.w1"), col("p.w2")).agg(count(lit(1)).as("n"))
    val b = base.select(explode(newPairs).as("p")).groupBy(col("p.w1"), col("p.w2")).agg(count(lit(1)).as("n"))
    println("symmetric diff: " + a.unionAll(b).groupBy("w1","w2","n").agg(count(lit(1)).as("k")).filter(col("k") =!= 2).count())
    s.stop()
  }
}
