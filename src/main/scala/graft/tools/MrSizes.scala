package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe: frame sizes inside the maxRepeats machinery at a
  * given sf (candidate windows, recurring positions, candidate-doc token
  * count) — sizing input for the r15 search rewrite. NOT gated. */
object MrSizes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val minLen = 32
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"), size(col("tk")).as("len"))
    println("docs=" + docs.count() + " tokens=" +
      toks.agg(sum(col("len"))).first().getLong(0))
    val wins = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= minLen)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(split(trim(col("text")), "\\s+")) - minLen),
        i => concat_ws(" ", slice(split(trim(col("text")), "\\s+"),
          i + lit(1), lit(minLen))))).as(Seq("wpos", "span")))
      .select(col("doc_id"), col("wpos"),
        conv(substring(md5(col("span")), 1, 15), 16, 10).cast("long").as("h"))
    wins.persist()
    println("wins=" + wins.count())
    val heavy = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("h"))
    val p0 = wins.join(heavy, Seq("h"), "left_semi")
    println("p0=" + p0.count())
    val candDocs = p0.select(col("doc_id")).distinct()
    println("candDocs=" + candDocs.count())
    val candToks = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(size(split(trim(col("text")), "\\s+")).as("len"))
    println("candTokens=" + candToks.agg(sum(col("len"))).first().getLong(0))
    s.stop()
  }
}
