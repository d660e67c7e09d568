package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, quality scoring, language ID, document
  * fingerprinting. All pure `functions._` compositions — codegen'd,
  * no UDFs, shuffle-free per-row transforms that scale linearly with
  * the corpus (the only shuffles are the callers' aggregations).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Mean token length, from char count net of separators — one pass,
    * no explode. */
  def avgTokenLen(text: Column): Column = {
    val n = size(tokens(text))
    (length(text) - (n - 1)).cast("double") / n
  }

  /** How many tokens fall in `words`. */
  def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** True iff the text contains ANY blocklisted token — the term
    * blocklist filter every production corpus applies (profanity /
    * spam / boilerplate markers) before training. Expression-only
    * (`arrays_overlap` against a literal array): codegen'd, shuffle-
    * free, linear — the right shape for a blocklist that fits in the
    * plan (up to ~thousands of terms). For a blocklist too large to
    * inline, use [[blockedDocs]] — a token-explode + broadcast
    * semi-join that keeps the corpus un-shuffled. */
  def blocked(text: Column, blocklist: Seq[String]): Column =
    arrays_overlap(tokens(text),
      array(blocklist.map(lit(_)): _*))

  /** Doc ids containing any term of a blocklist RELATION (the scale
    * path: a blocklist is corpus-independent and small relative to
    * 100 TB of documents, so it broadcasts; the corpus explodes to
    * (id, token) but never shuffles — the semi-join streams against
    * the broadcast hash table and duplicates collapse per-partition). */
  def blockedDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      blocklist: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val terms = blocklist.toDF("t")
    df.select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .join(broadcast(terms), Seq("t"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Function-word lists for the n-gram-free language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "von"))

  /** Predict language by function-word hits; deterministic tie-break
    * by list order (en > es > fr > de); no hits at all → "unknown". */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, words) =>
      lang -> hitCount(text, words)
    }
    val allZero = hits.map(_._2 === 0).reduce(_ && _)
    // priority argmax: first lang whose hits >= all later langs
    def pick(rest: List[(String, Column)]): Column = rest match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, h) :: tail =>
        when(tail.map(_._2).map(h >= _).reduce(_ && _), lit(lang))
          .otherwise(pick(tail))
      case Nil => lit("unknown")
    }
    when(allZero, "unknown").otherwise(pick(hits.toList))
  }

  /** Content fingerprint: md5 of the case-folded, space-normalized
    * text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Adjacent-token bigrams (array column). */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    transform(sequence(lit(0), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
  }

  /** A simple composite quality score in [0,1]: function-word density
    * plus a token-length plausibility band. */
  def qualityScore(text: Column): Column = {
    val stopRatio = hitCount(text, LangMarkers.flatMap(_._2))
      .cast("double") / tokenCount(text)
    val avgLen = avgTokenLen(text)
    stopRatio * 0.3 +
      when(avgLen >= 3.0 && avgLen <= 10.0, 0.7).otherwise(0.2)
  }
}
