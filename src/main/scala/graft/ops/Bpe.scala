package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE merge-loop trainer — the piece t15's one-round pair
  * count was missing: a real tokenizer pipeline trains by repeating
  * count → merge the argmax pair → re-segment, k times (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — public algorithm).
  *
  * Scale shape (the part that matters at 100 TB): the CORPUS is read
  * exactly once — one distributed word-frequency aggregate. Every
  * round after that works on the VOCABULARY relation (distinct word →
  * current symbol segmentation, weighted by count), the classic
  * trainer reduction: pair statistics over the corpus equal pair
  * statistics over the vocab × word counts. Per round:
  *
  *  1. one distributed pair-count aggregate (adjacent-pair explode,
  *     map-side combined; rows = vocab × avg word length),
  *  2. a ONE-ROW argmax collect — the merge rule — rebroadcast into
  *     the plan as literals (the "merge table broadcast" discipline:
  *     the driver never holds more than the k-row merge table),
  *  3. one narrow re-segmentation projection: a codegen'd
  *     `aggregate()` fold that merges non-overlapping leftmost
  *     occurrences (a freshly merged symbol never re-merges with the
  *     next token in the same round — fold-left gives Sennrich's
  *     scan semantics exactly, including odd/even alternation inside
  *     an `aa…a` run).
  *
  * Vocab is localCheckpointed per round, so plan depth and recompute
  * cost stay O(1) in k. Per-round wall is therefore flat in ROUND
  * NUMBER and linear in vocab — never in raw corpus size after the
  * first pass.
  *
  * Returns the k-row merge table: (round, lhs, rhs, pair_count) —
  * pair_count is the argmax pair's corpus frequency BEFORE that
  * round's merge. Ties break deterministically (count DESC, lhs ASC,
  * rhs ASC, binary collation both here and in the SQL oracle). */
object Bpe {

  /** One merge rule applied as a leftmost-non-overlapping fold over a
    * symbol array — the scan semantics both [[train]]'s
    * re-segmentation and [[encode]] share (a freshly merged symbol
    * never re-merges with the next token in the same pass). */
  private def mergeFold(syms: org.apache.spark.sql.Column, l: String,
      r: String): org.apache.spark.sql.Column =
    aggregate(syms, lit(Array.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    // corpus pass: word frequencies (empty tokens from repeated
    // delimiters carry no pairs and are dropped on both sides of the
    // oracle compare)
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // substring(col, pos, len) has no all-Column overload in
    // functions._; expr() keeps the initial one-char split readable
    var vocab = words.select(col("word"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"),
      col("cnt"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, " +
            "element_at(syms, i + 1) AS r))")).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, c))
        val old = vocab
        vocab = vocab.withColumn("syms", mergeFold(col("syms"), l, r))
          .localCheckpoint(true)
        old.unpersist()
        round += 1
      }
    }
    vocab.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** ENCODE — apply a learned merge table to tokenize `docs`,
    * completing the train → encode tokenizer pipeline. Rules apply in
    * training order, each with [[mergeFold]]'s leftmost-
    * non-overlapping scan, so on the training corpus the output
    * reproduces the trainer's final vocabulary segmentation exactly
    * (the t26 oracle), and unseen words tokenize the way any BPE
    * runtime would.
    *
    * Scale shape: tokenization runs on the DISTINCT-WORD relation
    * (vocabulary-bounded — k fold passes over words, localCheckpointed
    * so plan depth stays O(1) in k), then one join carries
    * word → tokens back onto the per-document word counts; the corpus
    * is read once and never re-scanned per rule. The merge table
    * itself lives in the plan as literals — the broadcast-the-model
    * discipline every scoring op here uses.
    *
    * Returns `(idCol, token, n)` — the tokenization multiset per
    * document. */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docWords = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("wn"))
    var vocab = docWords.select(col("word")).distinct()
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), " +
          "i -> substring(word, i, 1))"))
      .localCheckpoint(true)
    for ((l, r) <- merges) {
      val old = vocab
      vocab = vocab.withColumn("syms", mergeFold(col("syms"), l, r))
        .localCheckpoint(true)
      old.unpersist()
    }
    // the final vocab stays checkpointed: the returned plan reads its
    // blocks lazily (an eager unpersist here would drop them before
    // the caller's action; session teardown reclaims them)
    docWords.join(vocab, "word")
      .select(col(idCol), explode(col("syms")).as("token"), col("wn"))
      .groupBy(col(idCol), col("token")).agg(sum(col("wn")).as("n"))
  }

  /** The DuckDB replay of [[train]] — k merge rounds expressed as
    * chained CTEs (pair count + argmax per round; re-segmentation via
    * the run-parity window trick: inside a maximal chain of eligible
    * positions — which only occurs for lhs == rhs runs like `aaa` —
    * merges land on even offsets from the run start, exactly the
    * fold's leftmost-non-overlapping scan). Generated, not
    * hand-written, so the oracle replays EXACTLY k rounds. */
  def oracleSql(rounds: Int): String = {
    val finalSelect = (1 to rounds).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS round, l AS lhs, r AS rhs,
         |  CAST(c AS BIGINT) AS pair_count FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"${trainCtes(rounds)}\n$finalSelect\nORDER BY round"
  }

  /** The DuckDB replay of [[encode]] on the training corpus: the
    * trained chain's final vocabulary v_k IS the encoding of every
    * training word (same rules, same order, same scan), so the oracle
    * joins per-document word counts to v_k and unnests — while the
    * Spark side runs the real encoder path (fresh char split + k
    * fold passes), making the gate an independent-construction
    * equivalence, not a replay of itself. */
  def encodeOracleSql(rounds: Int): String =
    s"""${trainCtes(rounds)},
       |dw AS (
       |  SELECT doc_id, u AS word, COUNT(*) AS wn
       |  FROM documents, unnest(string_split(text, ' ')) t(u)
       |  WHERE len(u) >= 1 GROUP BY 1, 2)
       |SELECT doc_id, tok AS token, CAST(SUM(wn) AS BIGINT) AS n
       |FROM dw JOIN v$rounds USING (word), unnest(syms) u(tok)
       |GROUP BY 1, 2
       |ORDER BY doc_id, token""".stripMargin

  private def trainCtes(rounds: Int): String = {
    val init =
      """WITH w AS (
        |  SELECT u AS word, COUNT(*) AS cnt
        |  FROM documents, unnest(string_split(text, ' ')) t(u)
        |  WHERE len(u) >= 1 GROUP BY 1),
        |v0 AS (
        |  SELECT word, list_transform(range(1, len(word) + 1),
        |    i -> substring(word, CAST(i AS INT), 1)) AS syms, cnt
        |  FROM w)""".stripMargin
    val perRound = (1 to rounds).map { k =>
      s"""m$k AS (
         |  SELECT p.l AS l, p.r AS r, SUM(cnt) AS c
         |  FROM v${k - 1}, unnest(list_transform(range(1, len(syms)),
         |    i -> {'l': syms[CAST(i AS INT)],
         |          'r': syms[CAST(i AS INT) + 1]})) t(p)
         |  GROUP BY 1, 2 ORDER BY c DESC, l, r LIMIT 1),
         |x$k AS (
         |  SELECT word, cnt, i, syms[CAST(i AS INT)] AS sym,
         |    (i < len(syms)
         |      AND syms[CAST(i AS INT)] = (SELECT l FROM m$k)
         |      AND syms[CAST(i AS INT) + 1] = (SELECT r FROM m$k)) AS elig
         |  FROM v${k - 1}, unnest(range(1, len(syms) + 1)) t(i)),
         |y$k AS (
         |  SELECT *, CASE WHEN elig THEN i - ROW_NUMBER() OVER
         |    (PARTITION BY word, elig ORDER BY i) END AS grp FROM x$k),
         |z$k AS (
         |  SELECT *, elig AND ((i - MIN(i) OVER (PARTITION BY word, grp))
         |    % 2 = 0) AS mrg FROM y$k),
         |u$k AS (
         |  SELECT *, COALESCE(LAG(mrg) OVER
         |    (PARTITION BY word ORDER BY i), FALSE) AS prev_mrg FROM z$k),
         |v$k AS (
         |  SELECT word,
         |    list(CASE WHEN mrg THEN (SELECT l || r FROM m$k)
         |         ELSE sym END ORDER BY i)
         |      FILTER (WHERE NOT prev_mrg) AS syms, cnt
         |  FROM u$k GROUP BY word, cnt)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$init$perRound"
  }
}
