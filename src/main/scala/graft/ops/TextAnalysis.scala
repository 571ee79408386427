package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (split / transform / aggregate / filter higher-order functions) — no
  * UDFs, so whole-stage codegen spans the full pipeline and every operator
  * is a narrow map over the scan (zero shuffles until an aggregation asks
  * for one). That is the property that lets these run over 100 TB of text:
  * per-row work only, pushed column pruning (only `doc_id`/`text` read).
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword-ish token count: alphanumeric runs and single
    * non-space punctuation each count as one token (a common pre-tokenizer
    * regex shape). */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Word n-gram shingles (n consecutive tokens joined by a space), via
    * sequence+transform — pure HOFs, no explode needed until the caller
    * wants one row per shingle. Empty array when fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    // sequence(0, k) with k<0 would generate a *descending* sequence, so
    // guard short documents to an empty shingle set explicitly.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Per-document token statistics: token count (whitespace), regex token
    * count, mean token length. */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_regex_tokens", size(regexTokens(col(textCol))))
      .withColumn(
        "avg_token_len",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** A small function-word list used by both the quality score and the
    * language-ID heuristic (public-knowledge stopwords). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "est", "ce", "ne"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ein", "ist", "nicht", "von"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"),
  )

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Heuristic quality scoring: length, punctuation ratio, stopword ratio,
    * uppercase ratio, mean word length — the standard cheap filters a
    * pretraining pipeline applies before anything expensive. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nChars = length(col(textCol))
    val nPunct = nChars - length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", ""))
    val nUpper = nChars - length(regexp_replace(col(textCol), "[A-Z]", ""))
    df.withColumn("n_tokens", size(toks))
      .withColumn("punct_ratio", nPunct.cast("double") / nChars)
      .withColumn("upper_ratio", nUpper.cast("double") / nChars)
      .withColumn("stopword_ratio",
        countIn(toks, stopwords("en")).cast("double") / size(toks))
      .withColumn("avg_word_len",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** n-gram-heuristic language ID: score each candidate language by its
    * function-word hit count over the token stream; argmax wins, ties
    * break on language code order (deterministic). Integer scoring → no
    * float nondeterminism, and the whole thing is one codegen'd projection. */
  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      struct(countIn(toks, words).as("score"), lit(langCode).as("lang"))
    }
    // array_max on struct(score, lang) orders by score then lang — but we
    // want the *lowest* lang code on ties, so compare with reversed lang
    // rank encoded as negative index.
    val ranked = stopwords.keys.toSeq.sorted.zipWithIndex.map { case (langCode, i) =>
      struct(
        countIn(toks, stopwords(langCode)).as("score"),
        lit(-i).as("tiebreak"),
        lit(langCode).as("lang"))
    }
    df.withColumn("predicted_lang", array_max(array(ranked: _*)).getField("lang"))
      .withColumn("lang_score", array_max(array(scored: _*)).getField("score"))
  }

  /** Deterministic document fingerprint: polynomial rolling hash over the
    * token stream, h = (h*31 + tokenHash) mod p, with tokenHash derived
    * from the first 8 hex digits of md5(token) so the oracle can reproduce
    * it engine-independently. p small enough that h*31 + t never overflows
    * a signed 64-bit accumulator. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val p = 1000000007L
    val toks = tokens(col(textCol))
    val tokHash = (t: Column) => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % p
    df.withColumn(
      "fingerprint",
      aggregate(toks, lit(0L), (acc, t) => (acc * 31L + tokHash(t)) % p))
  }
}
