package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All are narrow per-row projections built from codegen'd built-ins (no
  * UDFs): at 100 TB they run at scan speed, column-pruned to just the text
  * column, and never shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is space-separated). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks — a portable proxy for tokenizer load estimation. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Small multilingual stopword inventory for n-gram/stopword language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que")
  )

  /** Fraction of tokens that are stopwords of `lang` (distinct-insensitive:
    * every token occurrence counts). */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = stopwords(lang)
    val ws = words(text)
    round(size(filter(ws, w => w.isInCollection(sw))) / size(ws).cast("double"), 6)
  }

  /** Heuristic language ID: the language with the highest stopword hit
    * count; 'und' (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(ws, w => w.isInCollection(sw))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality-score feature bundle (length / punctuation / stopword / word
    * shape), one pass over the text. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", size(ws))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, "\\s+", "")) / size(ws).cast("double"), 6))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[^a-zA-Z0-9\\s]"), lit(0)))
          / length(t).cast("double"), 6))
      .withColumn("stopword_ratio_en", stopwordRatio(t, "en"))
      .withColumn("alpha_ratio",
        round(size(regexp_extract_all(t, lit("[a-zA-Z]"), lit(0)))
          / length(t).cast("double"), 6))
  }

  /** Document fingerprint: md5 over the sorted distinct normalized word set
    * — stable under word reordering and duplication (the batch analog of a
    * rolling-hash fingerprint, collision-checked by dedup). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(lower(text))))))
}
