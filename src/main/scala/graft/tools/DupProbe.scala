package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe: duplicate multiplicity of the NN-descent
  * neighbor-of-neighbor candidate stream (rows / distinct pairs) on the
  * embedding fixture — the scale-side cost of retiring the candidate
  * `distinct()` in favor of aggregator-side dedupe. NOT gated. */
object DupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    for (k <- Seq(16)) {
      // one descent round's und edges, rebuilt from the op itself
      val g = graft.ops.Similarity.nnDescent(emb, k = k, rounds = 1)
      val cur = g.select(col("node_id").as("node"), col("neighbor_id").as("cand"))
      val und = cur.unionAll(cur.select(col("cand").as("node"), col("node").as("cand")))
      val cands = und.select(col("node").as("src"), col("cand").as("mid"))
        .join(und.select(col("node").as("mid"), col("cand")), Seq("mid"))
        .select(col("src").as("node"), col("cand"))
        .filter(col("node") =!= col("cand"))
      val total = cands.count()
      val dist = cands.distinct().count()
      println(f"k=$k  rows=$total  distinct=$dist  multiplicity=${total.toDouble / dist}%.2f")
    }
    s.stop()
  }
}
