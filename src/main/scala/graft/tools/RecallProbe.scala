package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measures approximate-ANN recall@k against the brute-force
  * exact answer on a fixture dir, and prints plan sizes for the native
  * vector expressions — the numbers behind the recall floors pinned in
  * OperatorSpec and the ann_*_recall gates. */
object RecallProbe {
  def recallPerQuery(exact: DataFrame, approx: DataFrame): Map[Long, Double] =
    Similarity.recallAtK(exact, approx)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // clustered scenario (the OperatorSpec fixture)
    locally {
      import spark.implicits._
      val dim = 64
      val rnd = new scala.util.Random(11)
      val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
      val pts = for (c <- centers.indices; j <- 0 until 40)
        yield ((c * 40 + j).toLong, centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
      val vecs = pts.toDF("vec_id", "embedding")
      val qs = vecs.filter(col("vec_id") % 40 === 0)
      val exact = Similarity.bruteForceTopK(vecs, qs, k = 10).cache()
      for ((name, approx) <- Seq(
          "clustered ivf n=8 p=2" -> Similarity.ivfTopK(vecs, qs, k = 10, nCells = 8, nProbe = 2),
          "clustered ivf n=16 p=4" -> Similarity.ivfTopK(vecs, qs, k = 10, nCells = 16, nProbe = 4),
          "clustered lsh 8 planes" -> Similarity.lshTopK(vecs, qs, k = 10))) {
        val r = recallPerQuery(exact, approx)
        println(f"$name: min=${r.values.min}%.2f mean=${r.values.sum / r.size}%.2f")
      }
    }
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 10).cache()
      for ((name, approx) <- Seq(
          "ivf n=16 p=2" -> Similarity.ivfTopK(emb, qs, k = 10),
          "ivf n=16 p=4" -> Similarity.ivfTopK(emb, qs, k = 10, nProbe = 4),
          "ivf n=16 p=6" -> Similarity.ivfTopK(emb, qs, k = 10, nProbe = 6),
          "ivf n=16 p=8" -> Similarity.ivfTopK(emb, qs, k = 10, nProbe = 8),
          "ivf n=8 p=2" -> Similarity.ivfTopK(emb, qs, k = 10, nCells = 8, nProbe = 2),
          "ivf n=8 p=3" -> Similarity.ivfTopK(emb, qs, k = 10, nCells = 8, nProbe = 3),
          "lsh 8 planes" -> Similarity.lshTopK(emb, qs, k = 10),
          "lsh 4 planes" -> Similarity.lshTopK(emb, qs, k = 10, nPlanes = 4),
          "lsh 3 planes" -> Similarity.lshTopK(emb, qs, k = 10, nPlanes = 3))) {
        val r = recallPerQuery(exact, approx)
        println(f"$dir $name: min=${r.values.min}%.2f mean=${r.values.sum / r.size}%.2f per-query=${r.toSeq.sortBy(_._1).map(_._2).map(v => f"$v%.2f").mkString(",")}")
      }
      // plan-size check: O(1) in nCells
      val big = Similarity.ivfTopK(emb, qs, k = 10, nCells = 64, sampleN = 500)
      println(s"$dir ivf nCells=64 plan chars: ${big.queryExecution.optimizedPlan.toString.length}")
      // MMR-over-IVF containment (the ann_mmr_ivf floor): per-query
      // overlap of IVF-candidate MMR picks with brute-force MMR picks
      val exactMmr = Similarity.mmrRerank(emb, qs, candK = 32, k = 8)
      val approxMmr = Similarity.mmrRerankFrom(emb,
        Similarity.ivfTopK(emb, qs, k = 32, nProbe = 8), k = 8)
      val hits = exactMmr.select(col("query_id"), col("neighbor_id"))
        .join(approxMmr.select(col("query_id").as("q2"),
          col("neighbor_id").as("n2")),
          col("query_id") === col("q2") && col("neighbor_id") === col("n2"),
          "left")
        .groupBy(col("query_id"))
        .agg(sum(when(col("n2").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      println(s"$dir mmr-ivf containment@8 of 8: " +
        hits.map { case (q, h) => s"$q=$h" }.mkString(","))
    }
    spark.stop()
  }
}
