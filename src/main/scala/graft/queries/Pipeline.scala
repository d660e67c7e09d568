package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Sampling, TextAnalysis}
import graft.ops.TextAnalysis._
import graft.util.Tables.load

/** The end-to-end training-data build, composed from the operators the
  * individual queries gate one by one: quality filter → exact dedup →
  * benchmark decontamination → stratified sampling → sequence packing.
  * One DataFrame chain, one DuckDB oracle of the same CTE chain — the
  * composition is the capability here: every stage is linear or
  * hash-partitioned exactly as its standalone query, and nothing
  * materializes between stages (Catalyst plans the whole build as one
  * job graph).
  *
  * Scale shape: quality/fingerprint are per-row expressions on the
  * scan; dedup is one window over the fingerprint hash partition;
  * decontam broadcasts the (small by nature) benchmark 8-gram set and
  * left-anti joins; sampling is a deterministic per-row predicate;
  * packing windows per source stratum. No stage shuffles the corpus
  * more than once.
  */
object Pipeline {

  /** Stages 1–4 (quality → dedup → decontam → sample): the shared
    * pre-packing chain; p01 packs it, p01b gates its per-stratum
    * counts so an empty packing output can never again hide a broken
    * upstream stage behind a vacuous 0-row hash match. */
  private def sampledDocs(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val docs = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)

      // benchmark side (doc_id % 10 == 0, the d09 convention): its
      // distinct 8-grams ban corpus docs verbatim-overlapping an eval set
      val benchGrams = docs.filter($"doc_id" % 10 === 0)
        .select(split($"text", " ").as("toks"))
        .filter(size($"toks") >= 8)
        .select(explode(array_distinct(
          transform(sequence(lit(1), size($"toks") - 7),
            i => array_join(slice($"toks", i, lit(8)), " ")))).as("g"))
        .distinct()

      // 1. corpus = non-benchmark docs passing the quality gate.
      // 0.715 ≈ in-band length + ≥5% function-word density: selective
      // (~22% of docs survive) but non-empty at every generated SF —
      // the old 0.75 bar emptied the whole pipeline on the regenerated
      // corpus and made the oracle gate vacuous (0 rows vs 0 rows).
      val quality = docs.filter($"doc_id" % 10 =!= 0)
        .withColumn("q", qualityScore($"text"))
        .filter($"q" >= 0.715)

      // 2. exact dedup: keep the lowest doc_id per content fingerprint
      val wFp = Window.partitionBy($"fp").orderBy($"doc_id")
      val deduped = quality
        .withColumn("fp", fingerprint($"text"))
        .withColumn("rn", row_number().over(wFp))
        .filter($"rn" === 1).drop("rn")

      // 3. decontamination: drop docs sharing any verbatim 8-gram.
      // NOT an anti-join of deduped against a subset of itself — that
      // consumes the dedup pipeline twice and Catalyst re-executes the
      // whole scan→quality→window subtree (measured; the r2 lesson).
      // Instead one pass: explode grams (null row for short docs),
      // mark hits against the broadcast bench set, keep docs whose
      // max(hit) is null. The per-doc aggregate partially collapses
      // map-side, so the shuffle carries one row per doc.
      val toks = split($"text", " ")
      val clean = deduped
        .select($"doc_id", $"lang", $"source",
          tokenCount($"text").as("n_tok"),
          explode_outer(when(size(toks) >= 8,
            array_distinct(transform(sequence(lit(1), size(toks) - 7),
              i => array_join(slice(toks, i, lit(8)), " "))))).as("g"))
        .join(broadcast(benchGrams.withColumn("hit", lit(1))),
          Seq("g"), "left_outer")
        .groupBy($"doc_id", $"lang", $"source", $"n_tok")
        .agg(max($"hit").as("hit"))
        .filter($"hit".isNull)

      // 4. deterministic stratified sampling by language
      Sampling.stratifiedSample(clean, "lang", "doc_id",
          rates = Map("en" -> 8, "es" -> 5), defaultRate = 2)
        .filter($"keep")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_train_pipeline" -> { (s, d) =>
      import s.implicits._
      // 5. pack into 512-token training sequences per source stratum
      val wPack = Window.partitionBy($"source").orderBy($"doc_id")
      sampledDocs(s, d)
        .select($"source", $"doc_id", $"n_tok")
        .withColumn("cum", sum($"n_tok").over(wPack))
        .withColumn("seq_id", expr("(cum - n_tok) div 512"))
        .groupBy($"source", $"seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"seq_id")
    },

    // pre-packing gate: per-(lang, source) survivors of stages 1–4 —
    // a multi-row oracle entry that stays non-empty at every SF and
    // pins the filter/dedup/decontam/sample composition even when the
    // packed output is small or empty
    "p01b_pipeline_strata" -> { (s, d) =>
      import s.implicits._
      sampledDocs(s, d)
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").cast("long").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"lang", $"source")
    }
  )

  private val markersSql: String = TextAnalysis.LangMarkers
    .flatMap(_._2).map(w => s"'$w'").mkString(", ")

  /** Shared CTE chain for stages 1–4 — the SQL twin of [[sampledDocs]]. */
  private val sampledCtes: String =
    s"""WITH bench_grams AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    range(1, len(string_split(text,' ')) - 6),
       |    i -> array_to_string(string_split(text,' ')[i:i+7], ' ')))) AS g
       |  FROM documents
       |  WHERE doc_id % 10 = 0 AND len(string_split(text,' ')) >= 8),
       |quality AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  WHERE doc_id % 10 <> 0 AND
       |    CAST(len(list_filter(string_split(text,' '),
       |        x -> x IN ($markersSql))) AS DOUBLE)
       |      / len(string_split(text,' ')) * 0.3 +
       |    CASE WHEN CAST(length(text) - (len(string_split(text,' ')) - 1)
       |           AS DOUBLE) / len(string_split(text,' ')) >= 3.0
       |      AND CAST(length(text) - (len(string_split(text,' ')) - 1)
       |           AS DOUBLE) / len(string_split(text,' ')) <= 10.0
       |      THEN 0.7 ELSE 0.2 END >= 0.715),
       |deduped AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY md5(trim(regexp_replace(lower(text),
       |        '\\s+', ' ', 'g')))
       |      ORDER BY doc_id) AS rn
       |    FROM quality) t
       |  WHERE rn = 1),
       |contaminated AS (
       |  SELECT DISTINCT d.doc_id
       |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
       |      range(1, len(string_split(text,' ')) - 6),
       |      i -> array_to_string(string_split(text,' ')[i:i+7], ' ')))) AS g
       |    FROM deduped WHERE len(string_split(text,' ')) >= 8) d
       |  JOIN bench_grams USING (g)),
       |sampled AS (
       |  SELECT doc_id, lang, source, len(string_split(text,' ')) AS n_tok
       |  FROM deduped
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
       |    AND doc_id % 10 <
       |      (CASE WHEN lang = 'en' THEN 8 WHEN lang = 'es' THEN 5
       |       ELSE 2 END))""".stripMargin

  val oracle: Map[String, String] = Map(
    "p01_train_pipeline" ->
      s"""$sampledCtes,
         |packed AS (
         |  SELECT source, doc_id, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM sampled)
         |SELECT source, CAST((cum - n_tok) // 512 AS BIGINT) AS seq_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p01b_pipeline_strata" ->
      s"""$sampledCtes
         |SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM sampled GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
