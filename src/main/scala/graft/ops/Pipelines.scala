package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end compositions of the individually oracle-gated operators —
  * the workflows a training-data user actually runs, wired in the order
  * that keeps every stage in its scale shape. */
object Pipelines {

  /** One-call training-corpus preparation:
    *
    *   0. canonical-URL exact dedup ([[Web.canonicalizeUrl]], only when
    *      a `urlCol` is supplied — crawl corpora first),
    *   1. near-dup dedup ([[Dedup.dedupCorpus]]: LSH candidates → exact
    *      verify → transitive groups → keep keepers),
    *   2. quality filter ([[TextAnalysis.repetitionStats]]: minimum
    *      length, maximum top-token fraction — the cheap Gopher-style
    *      gate),
    *   3. benchmark decontamination ([[Training.decontaminate]], only
    *      when a `bench` set is supplied — drops any doc sharing an
    *      8-token n-gram with the eval suite; runs after the cheap
    *      filters so the n-gram probe never sees rows already doomed,
    *      and before scrub/pack so a leaked doc costs nothing further),
    *   4. PII scrub ([[TextAnalysis.piiScrub]] — runs AFTER the filters
    *      so redaction work isn't spent on rows about to be dropped),
    *   5. greedy sequence packing over the scrubbed text
    *      ([[Training.packSequences]]).
    *
    * Dedup runs FIRST (its signatures must see original text, and
    * dropping duplicates shrinks every later stage); packing runs LAST
    * (token counts must reflect the scrubbed text that actually trains).
    * Output: one row per surviving document — (doc_id, text scrubbed,
    * n_tokens, seq_id, seq_offset). Every stage is a shape that survives
    * 100 TB: no all-pairs, no global single-task window, projections
    * codegen'd, the benchmark n-gram set broadcast. */
  def prepareCorpus(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dedupThreshold: Double = 0.8,
      minTokens: Long = 5, maxTopTokenFrac: Double = 0.5,
      capacity: Int = 512, bench: Option[DataFrame] = None,
      urlCol: Option[String] = None): DataFrame = {
    // Stage 0 (crawl corpora, when a URL column exists): exact dedup by
    // canonical URL — runs before content dedup because it is the
    // cheapest shrink (one projection + one keyed aggregate, no
    // signatures) and crawls re-fetch the same page under many raw
    // spellings. Representative: smallest id per canonical URL.
    val base = urlCol.fold(docs) { u =>
      val canon = docs.withColumn("__curl", Web.canonicalizeUrl(col(u)))
      val rep = canon.groupBy(col("__curl")).agg(min(col(idCol)).as("__rep"))
      canon.join(rep, Seq("__curl"))
        .filter(col(idCol) === col("__rep")).drop("__curl", "__rep")
    }
    val keepers = Dedup.dedupCorpus(base, idCol, textCol,
        threshold = dedupThreshold)
      .filter(!col("is_duplicate"))
    val filtered = TextAnalysis.repetitionStats(keepers, textCol)
      .filter(col("n_tokens") >= minTokens &&
        col("top_token_frac") <= maxTopTokenFrac)
    val clean = bench match {
      case None => filtered
      case Some(b) =>
        val flagged = Training.decontaminate(filtered, b, idCol, textCol)
          .filter(col("contaminated"))
          .select(col("doc_id").as(idCol))
        filtered.join(flagged, Seq(idCol), "left_anti")
    }
    val scrubbed = TextAnalysis.piiScrub(clean, textCol)
      .select(col(idCol), col("scrubbed").as(textCol))
    Training.packSequences(scrubbed, idCol, textCol, capacity)
      .join(scrubbed.select(col(idCol).as("doc_id"), col(textCol)), Seq("doc_id"))
      .select(col("doc_id"), col(textCol), col("n_tokens"),
        col("seq_id"), col("seq_offset"))
  }
}
