package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe: NN-descent recall@10 (vs brute force, 8 queries)
  * and wall time per rounds setting — sizing input for the r15 gate-cost
  * pass (VERDICT r14 #2). NOT gated. */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 8)
    val exact = graft.ops.Similarity.bruteForceTopK(emb, qs, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    exact.persist().count()
    for (rounds <- Seq(2, 3); k <- Seq(16, 24, 28)) {
      val t0 = System.nanoTime()
      val approx = graft.ops.Similarity.nnDescent(emb, k = k, rounds = rounds)
        .filter(col("node_id") < 8 && col("rank") <= 10)
        .select(col("node_id").as("q2"), col("neighbor_id").as("n2"))
      val hits = exact.join(approx,
          col("query_id") === col("q2") && col("neighbor_id") === col("n2"),
          "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
        .select(col("n_hits")).collect().map(_.getLong(0))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rounds=$rounds k=$k%2d  min=${hits.min}  hits=${hits.sorted.mkString(",")}  t=$dt%6.2f s")
    }
    s.stop()
  }
}
