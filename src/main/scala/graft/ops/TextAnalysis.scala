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

  /** One redaction rule: every match of `pattern` is replaced by the
    * literal marker `<TAG>`. */
  final case class RedactRule(tag: String, pattern: String) {
    def marker: String = s"<$tag>"
  }

  /** The standard PII scrub set (emails, NANP-style phone numbers,
    * IPv4 literals, long digit runs) — the redaction pass a corpus
    * takes before any text is retained for training. Patterns stay in
    * the RE2-compatible subset (char classes, `\b`, bounded repeats)
    * so the same strings run under both the JVM regex engine and
    * RE2-family engines (the DuckDB oracle). */
  val PiiRules: Seq[RedactRule] = Seq(
    RedactRule("EMAIL", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    RedactRule("PHONE", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"),
    RedactRule("IP", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"),
    RedactRule("NUM", "\\b\\d{6,}\\b"))

  /** Text after applying `rules` IN ORDER (rule i sees the output of
    * rules 1..i-1 — order is part of the contract: a NUM rule after a
    * PHONE rule cannot re-match digits the PHONE rule already
    * consumed). Pure nested `regexp_replace` — codegen'd, shuffle-free,
    * linear in the corpus like every other per-row transform here. */
  def redacted(text: Column, rules: Seq[RedactRule]): Column =
    rules.foldLeft(text)((t, r) => regexp_replace(t, r.pattern, r.marker))

  /** The full ordered pipeline in ONE pass per rule: `struct(redacted,
    * counts)` from the fused [[graft.functions.RedactWithCounts]]
    * kernel — each rule pays exactly one matcher pass, where deriving
    * each count from the re-built rule prefix costs O(rules²) regex
    * passes per row. Count i is taken on the text after rules 1..i-1
    * (the sequential contract), structurally: one matcher produces
    * both the count and the replacement. */
  def redactWithCounts(text: Column, rules: Seq[RedactRule]): Column =
    graft.functions.RedactWithCounts(text,
      rules.map(r => (r.pattern, r.marker)))

  /** Per-rule match counts under the same sequential contract as
    * [[redacted]]: count i is taken on the text AFTER rules 1..i-1
    * applied, so counts and replacements always agree. Returned in
    * rule order. Extractions over one shared [[redactWithCounts]]
    * struct — whole-stage codegen's subexpression elimination
    * evaluates the kernel once per row when several counts (or the
    * redacted text) appear in the same projection. */
  def redactCounts(text: Column, rules: Seq[RedactRule]): Seq[Column] = {
    val r = redactWithCounts(text, rules)
    rules.indices.map(i => element_at(r.getField("counts"), i + 1))
  }

  /** Adjacent-token bigrams (array column). Guarded for sub-2-token
    * documents: `sequence(0, n-2)` DESCENDS when n < 2 (Spark's
    * sequence supports reverse ranges), which would index past the
    * token array — real corpora contain empty and one-token rows. */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
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
