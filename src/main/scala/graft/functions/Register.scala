package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registers the native expressions as SQL functions so `spark.sql` users
  * get the same codepaths as the Column API (`cosine_sim(a, b)`,
  * `dot_product(a, b)`, `jaccard_sorted(a, b)`, `shingle_hashes(text, n)`,
  * `sig_agreement(a, b)`, `text_simhash(text)`, `hamming_bits(a, b)`,
  * `text_stats(text)` — en-stopword variant of the fused statistics —
  * and `text_repetition(text)`, the fused repetition counts). */
object GraftFunctions {
  private def intLit(e: Expression): Int =
    e.asInstanceOf[Literal].value.asInstanceOf[Number].intValue()

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sig_agreement",
      es => SignatureAgreement(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaccard_sorted",
      es => JaccardSorted(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(es(0), intLit(es(1))), "built-in")
    reg.createOrReplaceTempFunction("text_simhash",
      es => TextSimHash(es(0)), "built-in")
    reg.createOrReplaceTempFunction("hamming_bits",
      es => HammingBits(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("text_stats",
      es => TextStats(es(0), graft.ops.TextAnalysis.stopwords("en")), "built-in")
    reg.createOrReplaceTempFunction("text_repetition",
      es => TextRepetition(es(0)), "built-in")
    reg.createOrReplaceTempFunction("shingle_md5_keys",
      es => ShingleMd5Keys(es(0), intLit(es(1))), "built-in")
    reg.createOrReplaceTempFunction("quantize_int8",
      es => QuantizeInt8(es(0)), "built-in")
  }
}
