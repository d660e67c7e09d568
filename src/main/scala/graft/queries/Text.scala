package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.ops.TextAnalysis._
import graft.util.Tables.load

/** Text-analysis surface over the documents table (t01-t05), each
  * mirrored by DuckDB list/regex SQL. All per-row transforms are
  * codegen'd expression trees; aggregations (fingerprint groups,
  * bigram counts) are ordinary hash aggregates with partial
  * aggregation — linear scans at 100 TB.
  */
object Text {

  /** t20's gate rule set: two PII shapes plus a term rule that hits
    * this corpus (word-salad text has no digits or '@', so a pure PII
    * gate would compare an identity map — the vacuous-gate trap p01
    * fell into; the TERM rule keeps real replacements in the gate
    * while TextOpsSpec proves the PII shapes on crafted fixtures). */
  private val RedactGateRules: Seq[TextAnalysis.RedactRule] = Seq(
    TextAnalysis.PiiRules(0),                                 // EMAIL
    TextAnalysis.PiiRules(2),                                 // IP
    TextAnalysis.RedactRule("TERM", "\\b(customer|vector)\\b"))

  private val markersSql: Map[String, String] =
    TextAnalysis.LangMarkers.toMap.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString(", ")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- tokenization statistics ----
    "t01_token_stats" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          tokenCount($"text").as("n_tokens"),
          uniqueTokenCount($"text").as("n_uniq"),
          avgTokenLen($"text").as("avg_len"),
          $"n_chars")
        .orderBy($"doc_id")
    },

    // ---- quality scoring ----
    "t02_quality" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id",
          hitCount($"text", TextAnalysis.LangMarkers.flatMap(_._2)).as("stop_hits"),
          qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },

    // ---- language identification (function-word heuristic) ----
    "t03_langid" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id", $"lang",
          langId($"text").as("pred_lang"))
        .withColumn("is_match", $"pred_lang" === $"lang")
        .orderBy($"doc_id")
    },

    // ---- document fingerprinting (exact-dup clusters) ----
    "t04_fingerprint" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id", fingerprint($"text").as("fp"))
        .groupBy($"fp")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc"))
        .orderBy($"fp")
    },

    // ---- stopword removal / normalization ----
    "t06_stopword_removal" -> { (s, d) =>
      import s.implicits._
      val stops = TextAnalysis.LangMarkers.flatMap(_._2)
      // the HOF filter is interpreted (CodegenFallback) — don't let it
      // run on the single-partition scan
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id",
          filter(tokens(lower($"text")), t => !t.isin(stops.map(lit(_)): _*))
            .as("kept"))
        .select($"doc_id",
          size($"kept").cast("long").as("n_kept"),
          // get() is null-safe on the empty array (a fully-stopword
          // doc keeps nothing) — matching DuckDB's kept[1] = NULL
          get($"kept", lit(0)).as("first_kept"))
        .orderBy($"doc_id")
    },

    // ---- character n-gram profile ----
    "t07_char_trigrams" -> { (s, d) =>
      import s.implicits._
      // single-file input = one partition; the per-row distinct pass is
      // the whole cost, so spread it before computing. The distinct
      // count itself is the fused UniqueTrigramCount kernel — the
      // declarative substring/array_distinct form was the one text
      // query that stayed per-row-bound at 10× (ScaleCheck ratio 6.7)
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id",
          when(length($"text") >= 3,
            graft.functions.UniqueTrigramCount($"text"))
          .otherwise(size(array_distinct(
            transform(sequence(lit(1), length($"text") - 2),
              i => $"text".substr(i, lit(3))))).cast("long"))
          .as("n_uniq_tri"))
        .orderBy($"doc_id")
    },

    // ---- n-gram extraction: top-20 bigrams ----
    "t05_top_bigrams" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(bigrams($"text")).as("bg"))
        .groupBy($"bg")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bg")
        .limit(20)
    },

    // ---- tf-idf keyword extraction: top-3 terms per document ----
    // tf and df are two hash aggregates over one token explode (both
    // map-side partial); ranking is integer-only (tf desc, df asc,
    // term asc) so it is deterministic and engine-independent — the
    // displayed smoothed-idf score is informational (round-6). At
    // 100 TB: linear scan + two shuffles on term-sized keys; the
    // 1-row corpus count broadcasts.
    "t09_tfidf" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
      val total = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", explode(tokens($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      // tf has one row per (doc, term), so df is a count over the term
      // partition — a window, NOT a groupBy+self-join, which would
      // evaluate the whole scan→explode→aggregate subtree twice
      // (Catalyst does not reuse that exchange across the join's sides)
      val wDf = org.apache.spark.sql.expressions.Window.partitionBy($"term")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"term".asc)
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(broadcast(total))
        .withColumn("tfidf", round($"tf" *
          (log(($"n_docs" + 1).cast("double") / ($"df" + 1)) + 1), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 3)
        .select($"doc_id", $"term", $"tf", $"df", $"tfidf", $"rank")
        .orderBy($"doc_id", $"rank")
    },

    // ---- repetition signals (Gopher-style quality heuristics):
    //      duplicate-token fraction, most-common-token fraction,
    //      most-common-bigram fraction — all integer-ratio doubles
    //      (bit-exact across engines), linear per-doc aggregates ----
    "t10_repetition" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val base = docs.select($"doc_id",
        tokenCount($"text").as("n_tokens"),
        uniqueTokenCount($"text").as("n_uniq"))
      val topTok = docs
        .select($"doc_id", explode(tokens($"text")).as("tk"))
        .groupBy($"doc_id", $"tk").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_tok"))
      val topBg = docs
        .select($"doc_id", explode(bigrams($"text")).as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_bg"))
      base.join(topTok, "doc_id").join(topBg, "doc_id")
        .select($"doc_id", $"n_tokens",
          (lit(1.0) - $"n_uniq".cast("double") / $"n_tokens")
            .as("dup_token_frac"),
          ($"top_tok".cast("double") / $"n_tokens").as("top_token_frac"),
          ($"top_bg".cast("double") / ($"n_tokens" - 1))
            .as("top_bigram_frac"))
        .orderBy($"doc_id")
    },

    // ---- training-sequence packing (concatenate-and-chunk) ----
    // the sample-packing step before tokenized training: documents
    // concatenate in (source, doc_id) order and chunk into 512-token
    // sequences; a doc belongs to the chunk containing its first
    // token. One running-sum window PER SOURCE — packing parallelizes
    // across sources (at 100 TB you would additionally sub-bucket a
    // giant source by a path/time prefix to bound any one window's
    // partition; the per-stratum shape is the point here).
    "t11_seq_pack" -> { (s, d) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
      load(s, d, "documents")
        .select($"source", $"doc_id", tokenCount($"text").as("n_tok"))
        .withColumn("cum", sum($"n_tok").over(w))
        .withColumn("seq_id", expr("(cum - n_tok) div 512"))
        .groupBy($"source", $"seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"seq_id")
    },

    // ---- corpus vocabulary statistics per source stratum ----
    // the vocabulary-building pass before tokenizer training: corpus
    // token count, vocabulary size, hapax count, and type-token ratio
    // per source. One explode + two hash aggregates, both map-side
    // partial; the term-frequency relation shuffles on (source, token)
    // — linear in corpus size, key space bounded by the vocabulary.
    "t12_vocab_growth" -> { (s, d) =>
      import s.implicits._
      val tf = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"source", explode(tokens($"text")).as("tk"))
        .groupBy($"source", $"tk").agg(count(lit(1)).as("c"))
      tf.groupBy($"source")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("vocab"),
          count(when($"c" === 1, 1)).as("hapax"))
        .select($"source", $"n_tokens", $"vocab", $"hapax",
          round($"vocab".cast("double") / $"n_tokens", 6).as("ttr"))
        .orderBy($"source")
    },

    // ---- unigram LM scoring (model-based quality filtering) ----
    // the perplexity-style pass: train corpus unigram frequencies,
    // score each document by its mean negative log-probability. The
    // token→frequency join shuffles on the token (vocabulary-sized key
    // space — NOT broadcast, since a 100 TB corpus's vocabulary is
    // itself large); the 1-row corpus total broadcasts. Decimal-summed
    // mean keeps the aggregate order-insensitive; ln parity with the
    // oracle holds under the round-6 output contract.
    "t13_lm_score" -> { (s, d) =>
      import s.implicits._
      val toks = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", explode(tokens($"text")).as("tk"))
      val tf = toks.groupBy($"tk").agg(count(lit(1)).as("c"))
      val total = tf.agg(sum($"c").as("n_corpus"))
      toks.join(tf, "tk")
        .crossJoin(broadcast(total))
        .select($"doc_id", (-log($"c".cast("double") / $"n_corpus")).as("nlp"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum($"nlp".cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("avg_neg_logp"))
        .orderBy($"doc_id")
    },

    // ---- interpolated bigram LM scoring ----
    // the next rung above t13's unigram model: per position,
    // p = 0.7·p(w2|w1) + 0.3·p(w2), score = mean −ln p. Counts are
    // two hash aggregates (bigram- and unigram-keyed, both map-side
    // partial); the score pass joins on token-sized keys — shuffled,
    // not broadcast, for the same reason as t13 (a 100 TB corpus's
    // n-gram table is itself large). Arithmetic is written in the
    // exact same operation order as the oracle; the decimal-summed
    // mean keeps the result order-insensitive.
    "t14_bigram_lm" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val toks = docs.select($"doc_id", explode(tokens($"text")).as("tk"))
      val ugc = toks.groupBy($"tk").agg(count(lit(1)).as("c"))
      val total = ugc.agg(sum($"c").as("n_corpus"))
      val bg = docs
        .select($"doc_id", tokens($"text").as("t"))
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(transform(sequence(lit(1), size($"t") - 1),
          i => struct(element_at($"t", i).as("w1"),
            element_at($"t", i + 1).as("w2")))).as("p"))
        .select($"doc_id", $"p.w1", $"p.w2")
      val bgc = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("cbg"))
      bg.join(bgc, Seq("w1", "w2"))
        .join(ugc.select($"tk".as("w1"), $"c".as("c1")), "w1")
        .join(ugc.select($"tk".as("w2"), $"c".as("c2")), "w2")
        .crossJoin(broadcast(total))
        .select($"doc_id",
          (-log(lit(0.7) * ($"cbg".cast("double") / $"c1") +
            lit(0.3) * ($"c2".cast("double") / $"n_corpus"))).as("nlp"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum($"nlp".cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("avg_neg_logp2"))
        .orderBy($"doc_id")
    },

    // ---- BPE-style regex token counting (tokenizer fertility) ----
    // the pre-training budget estimate: whitespace words vs GPT-2-ish
    // regex pretokens (leading-space word / number / punctuation runs
    // — the lookahead-free RE2-safe subset, so the IDENTICAL pattern
    // runs in Spark's Java regex and DuckDB's RE2). fertility =
    // pretokens per word, the number tokenizer planning actually
    // uses. One linear projection, no shuffle beyond the sort.
    "t15_bpe_count" -> { (s, d) =>
      import s.implicits._
      val pat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_words"),
          size(regexp_extract_all($"text", lit(pat), lit(0)))
            .cast("long").as("n_pretokens"))
        .withColumn("fertility",
          round($"n_pretokens".cast("double") / $"n_words", 6))
        .orderBy($"doc_id")
    },

    // ---- BPE merge-loop TRAINER (t15 is the one-round count) ----
    // count → merge argmax pair → re-segment, k rounds: the corpus is
    // read once (word-frequency aggregate), every round then works on
    // the vocabulary relation with the 1-row merge rule broadcast
    // back as literals (ops/Bpe.scala). The DuckDB oracle REPLAYS all
    // k rounds exactly (generated CTE chain incl. the run-parity
    // re-segmentation), so argmax, tie-breaks, and the
    // leftmost-non-overlapping merge scan are all gated.
    "t25_bpe_train" -> { (s, d) =>
      import s.implicits._
      graft.ops.Bpe.train(load(s, d, "documents"), "text", rounds = 4)
        .orderBy($"round")
    },

    // ---- BPE ENCODE (t25's other half: train → tokenize) ----
    // applies the learned merge table in training order over the
    // DISTINCT-WORD relation (k codegen fold passes, vocabulary-
    // bounded), then one join carries word → tokens back to per-doc
    // counts. The oracle replays the trainer chain and reads the
    // final vocabulary's segmentation — rule order + the leftmost-
    // non-overlapping scan must reproduce it from a fresh char split,
    // an independent-construction gate (BpeSpec pins unseen-word
    // encoding against a driver-side reference).
    "t26_bpe_encode" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
      val merges = graft.ops.Bpe.train(docs, "text", rounds = 4)
        .orderBy($"round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.ops.Bpe.encode(docs, "text", "doc_id", merges)
        .orderBy($"doc_id", $"token")
    },

    // ---- term-blocklist filter (profanity/spam/marker terms) ----
    // the other standard corpus gate next to t08's quality score: drop
    // any document containing a blocklisted token. Expression-only
    // (arrays_overlap against the literal list — codegen, no shuffle,
    // no explode); the large-blocklist path is TextAnalysis.blockedDocs
    // (broadcast semi-join), proven equal in TrigramPropertySpec.
    // "deadlock" is deliberately corpus-absent: real blocklists carry
    // terms that may never occur, and the filter must not care.
    "t16_blocklist" -> { (s, d) =>
      import s.implicits._
      import graft.ops.TextAnalysis
      load(s, d, "documents")
        .select($"source",
          TextAnalysis.blocked($"text", Seq("dup", "deadlock")).as("hit"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(!$"hit", 1)).as("n_kept"))
        .withColumn("retention",
          round($"n_kept".cast("double") / $"n_docs", 6))
        .orderBy($"source")
    },

    // ---- context-window chunking with overlap ----
    // the complement of t11's packing: long documents split into
    // token-bounded chunks (size 32, stride 24 → 8-token overlap so
    // no span is lost at a boundary), the standard pre-training /
    // retrieval-indexing shape. One explode with bounded per-row
    // fan-out (ceil(n_tokens/stride) chunks), no shuffle before the
    // final sort — linear at any corpus size.
    "t17_chunk" -> { (s, d) =>
      import s.implicits._
      val chunkSize = 32
      val stride = 24
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", split($"text", " ").as("toks"))
        .select($"doc_id", posexplode(transform(
          sequence(lit(0), floor((size($"toks") - 1) / stride)),
          i => array_join(slice($"toks", i * stride + 1, lit(chunkSize)), " "))))
        .select($"doc_id", $"pos".cast("long").as("chunk_id"),
          col("col").as("chunk"),
          size(split(col("col"), " ")).cast("long").as("n_tokens"))
        .orderBy($"doc_id", $"chunk_id")
    },

    // ---- novelty scoring: the dataset-curation redundancy curve ----
    // fraction of a document's distinct 8-grams whose FIRST corpus
    // occurrence (by doc_id order) is this document — d10's
    // boilerplate view asks "what recurs"; this asks "what does each
    // document newly contribute", the per-document form of t12's
    // corpus-level vocabulary growth. Shape: one linear gram explode,
    // one hash aggregate keyed on gram (min doc_id — partial-agg),
    // one gram-keyed equi-join back (both sides hash on the same key,
    // so the aggregate's exchange is reusable), one per-doc aggregate.
    // Nothing pairwise, nothing driver-side; integer-ratio novelty is
    // engine-exact.
    "t18_novelty" -> { (s, d) =>
      import s.implicits._
      val grams = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", split($"text", " ").as("toks"))
        .filter(size($"toks") >= 8)
        .select($"doc_id", explode(array_distinct(
          transform(sequence(lit(1), size($"toks") - 7),
            i => array_join(slice($"toks", i, lit(8)), " ")))).as("g"))
      val firstSeen = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
      grams.join(firstSeen, "g")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
            .as("n_novel"))
        .select($"doc_id", $"n_grams", $"n_novel",
          round($"n_novel".cast("double") / $"n_grams", 6).as("novelty"))
        .orderBy($"doc_id")
    },

    // ---- token-distribution entropy: the information-theoretic
    //      repetitiveness signal ----
    // templated / machine-spun text scores low even when t10's
    // longest-run and d10's worst-window views look clean, because
    // entropy sees the WHOLE token distribution. Declaratively this is
    // an explode + two hash aggregates per doc (a corpus-sized
    // shuffle); the fused TokenEntropy kernel keeps it per-row inside
    // whole-stage codegen, so the corpus never shuffles for a per-doc
    // score. Token counts are integer-identical to the oracle's
    // string_split; the final H = log2(n) − Σ c·log2(c)/n expression
    // is written with the same shape on both sides.
    "t19_token_entropy" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"doc_id", $"lang",
          size(split($"text", " ")).cast("long").as("n_tokens"),
          round(graft.functions.TokenEntropy($"text"), 6).as("entropy"))
        .orderBy($"doc_id")
    },

    // ---- span redaction with per-category counts (PII-scrub shape) ----
    // the pass a corpus takes before text retention: category rules
    // applied in order, each producing a redacted span marker plus a
    // per-doc count. The gate mixes PII shapes (email, IPv4 — zero
    // hits on this corpus, proven live on crafted fixtures in
    // TextOpsSpec) with term rules that DO hit, so the gate compares
    // real replacements, not an identity map. Scan → project → sort:
    // no shuffle before the output ordering, linear at any corpus
    // size.
    "t20_redact" -> { (s, d) =>
      import s.implicits._
      val rules = RedactGateRules
      // ONE kernel eval per row: counts and the redacted text come out
      // of the same fused RedactWithCounts struct (CollapseProject
      // keeps the non-cheap struct staged rather than inlining four
      // copies), so each rule costs exactly one matcher pass
      load(s, d, "documents")
        .select($"doc_id",
          TextAnalysis.redactWithCounts($"text", rules).as("r"))
        .select($"doc_id",
          element_at($"r.counts", 1).as("n_email"),
          element_at($"r.counts", 2).as("n_ip"),
          element_at($"r.counts", 3).as("n_term"),
          $"r.redacted".as("text_red"))
        .orderBy($"doc_id")
    },

    // ---- DSIR importance scoring (hashed-ngram data selection) ----
    // score = per-doc log-likelihood ratio of bigram features under a
    // target-domain model (here: the English sub-corpus) vs the raw
    // corpus. The gate runs the exact raw-bigram mode; the hashed
    // mode (stats broadcast, corpus shuffled once on doc id) is the
    // 100 TB path, spec-gated against an independent reference. The
    // selection rule is a score threshold (> 0 = likelier target
    // than raw), not a global rank — rank needs a corpus-wide sort
    // the selection semantics doesn't.
    "t21_dsir_score" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
      val sc = graft.ops.Dsir.scores(docs, "doc_id", "text",
        targetPred = $"lang" === "en")
      docs.select($"doc_id", $"lang")
        .join(sc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
        .select($"doc_id", $"lang",
          coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
          round(coalesce($"score", lit(0.0)), 6).as("score"),
          coalesce(round($"score", 6) > 0, lit(false)).as("selected"))
        .orderBy($"doc_id")
    },

    // ---- corpus-level distribution shift per source stratum ----
    // the report a mixture designer reads next to t21's doc scores:
    // how far each source's token distribution sits from the target
    // domain (truncated-support smoothed KL, bits). en-heavy sources
    // sit near the target; others rank by real shift — the signal
    // that drives per-source mixture weights.
    "t22_source_divergence" -> { (s, d) =>
      import s.implicits._
      graft.ops.Dsir.divergence(load(s, d, "documents"), "source", "text",
          targetPred = $"lang" === "en")
        .select($"g".as("source"), $"n_tokens",
          round($"divergence", 6).as("divergence"))
        .orderBy($"source")
    },

    // ---- quality-gated filtering with per-stratum retention ----
    // the pipeline step a training-data build actually runs: score,
    // threshold, and report how much of each (lang, source) stratum
    // survives (decimal-summed mean keeps the aggregate
    // order-insensitive and oracle-identical)
    "t08_quality_filter" -> { (s, d) =>
      import s.implicits._
      load(s, d, "documents")
        .select($"lang", $"source", qualityScore($"text").as("q"))
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"q" >= 0.75, 1)).as("n_kept"),
          sum($"q".cast("decimal(18,9)")).cast("double").as("q_sum"))
        .select($"lang", $"source", $"n_docs", $"n_kept",
          round($"q_sum" / $"n_docs", 4).as("avg_quality"),
          round($"n_kept".cast("double") / $"n_docs", 6).as("retention"))
        .orderBy($"lang", $"source")
    },

    // ---- BM25 lexical retrieval over an inverted index ----
    // the retrieval half RAG/decontamination pipelines actually run
    // (s10's lexical leg is raw set overlap; this is the ranked
    // Lucene-BM25 scorer: idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    // k1=1.2 b=0.75). Plan shape IS the inverted-index build: one
    // scan→explode→hash-agg produces the postings (term, doc, tf, dl);
    // df is a window over the term partition (t09's trick — a
    // groupBy+self-join would evaluate the postings subtree twice);
    // query terms broadcast (queries are always the small side); score
    // aggregation shuffles only postings that MATCH a query term. At
    // 100 TB the postings relation is the linear-in-corpus artifact
    // every search engine materializes; nothing here is pairwise.
    // Cross-engine determinism: idf is ln() rounded to 6 up front (the
    // one libm call), every other factor is exactly-rounded IEEE
    // arithmetic on integers/avgdl with identical parenthesization in
    // both engines, and per-term contributions sum as DECIMAL(28,18)
    // (the p04 discipline) so addition order cannot change the hash.
    "t23_bm25_topk" -> { (s, d) =>
      import s.implicits._
      val toks = load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", tokens($"text").as("t"))
      val postings = toks
        .select($"doc_id", size($"t").cast("long").as("dl"),
          explode($"t").as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"), max($"dl").as("dl"))
      // derived from toks, not a fresh load: the repartition exchange
      // under toks is reused (postings/qterms/stats share one scan —
      // a second load would re-read and re-tokenize the corpus)
      val stats = toks
        .agg(count(lit(1)).as("n_docs"),
          avg(size($"t").cast("long")).as("avgdl"))
      val qterms = toks.filter($"doc_id" < 5)
        .select($"doc_id".as("qid"),
          explode(array_distinct($"t")).as("term"))
      val wDf = org.apache.spark.sql.expressions.Window.partitionBy($"term")
      val contrib = postings
        .withColumn("df", count(lit(1)).over(wDf))
        .join(broadcast(qterms), "term")
        .filter($"doc_id" =!= $"qid")
        .crossJoin(broadcast(stats))
        .select($"qid", $"doc_id".as("id"),
          (round(log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0), 6) *
            ($"tf" * lit(2.2)) /
            ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
            .cast("decimal(28,18)").as("c"))
      val wQ = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sc".desc, $"id")
      contrib.groupBy($"qid", $"id").agg(sum($"c").as("sc"))
        .withColumn("rank", row_number().over(wQ).cast("long"))
        .filter($"rank" <= 10)
        .select($"qid", $"id",
          round($"sc".cast("double"), 6).as("score"), $"rank")
        .orderBy($"qid", $"rank")
    },

    // ---- classifier-based quality filtering (NB, weak labels) ----
    // the third filtering leg next to t08 (heuristic threshold) and
    // t21 (DSIR importance weights): train a multinomial Naive-Bayes
    // model on weak labels (lang='en' as the target domain — the t21
    // convention), score every document by the class log-posterior
    // ratio, keep at log-odds > 0. See graft.ops.NbClassifier for the
    // model and the decimal-summed determinism contract.
    "t24_nb_filter" -> { (s, d) =>
      import s.implicits._
      val docs = load(s, d, "documents")
      docs.select($"doc_id", $"lang")
        .join(graft.ops.NbClassifier.scores(docs, "doc_id", "text",
            targetPred = $"lang" === "en")
          .withColumnRenamed("id", "doc_id"), Seq("doc_id"))
        .select($"doc_id", $"lang", $"n_tokens", $"nb_score", $"keep")
        .orderBy($"doc_id")
    }
  )

  private def hitsSql(listSql: String) =
    s"len(list_filter(string_split(text,' '), x -> x IN ($listSql)))"

  val oracle: Map[String, String] = Map(
    "t22_source_divergence" ->
      """WITH tk AS (
        |  SELECT source, lang, unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |sw AS (SELECT source, w, COUNT(*) AS cs FROM tk GROUP BY 1, 2),
        |tw AS (SELECT w, COUNT(CASE WHEN lang = 'en' THEN 1 END) AS ct
        |       FROM tk GROUP BY 1),
        |totg AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns
        |         FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, COUNT(*) AS v FROM tw),
        |terms AS (
        |  SELECT sw.source,
        |    ((sw.cs + 0.5) / (totg.ns + 0.5 * tot.v)) *
        |      log2(((sw.cs + 0.5) / (totg.ns + 0.5 * tot.v)) /
        |           ((tw.ct + 0.5) / (tot.nt + 0.5 * tot.v))) AS term
        |  FROM sw JOIN tw USING (w) JOIN totg USING (source) CROSS JOIN tot)
        |SELECT t.source, tg.ns AS n_tokens,
        |  round(SUM(t.term), 6) AS divergence
        |FROM terms t JOIN totg tg ON t.source = tg.source
        |GROUP BY 1, 2 ORDER BY t.source""".stripMargin,

    "t21_dsir_score" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS f
        |  FROM toks),
        |stats AS (
        |  SELECT f, COUNT(*) AS cr,
        |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS ct
        |  FROM bg GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt,
        |    COUNT(*) AS v
        |  FROM stats),
        |sc AS (
        |  SELECT b.doc_id,
        |    SUM(log2(((s.ct + 0.5) / (tot.nt + 0.5 * tot.v)) /
        |             ((s.cr + 0.5) / (tot.nr + 0.5 * tot.v)))) AS score,
        |    COUNT(*) AS nb
        |  FROM bg b JOIN stats s USING (f) CROSS JOIN tot GROUP BY 1)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(CAST(sc.nb AS BIGINT), 0) AS n_bigrams,
        |  round(COALESCE(sc.score, 0), 6) AS score,
        |  COALESCE(round(sc.score, 6) > 0, FALSE) AS selected
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "t20_redact" -> {
      // the same sequential contract as the engine: rule i counts and
      // replaces on the text after rules 1..i-1 applied
      val (e, i, t) = (RedactGateRules(0), RedactGateRules(1), RedactGateRules(2))
      s"""WITH s1 AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '${e.pattern}')) AS n_email,
         |    regexp_replace(text, '${e.pattern}', '${e.marker}', 'g') AS t1
         |  FROM documents),
         |s2 AS (
         |  SELECT doc_id, n_email,
         |    len(regexp_extract_all(t1, '${i.pattern}')) AS n_ip,
         |    regexp_replace(t1, '${i.pattern}', '${i.marker}', 'g') AS t2
         |  FROM s1),
         |s3 AS (
         |  SELECT doc_id, n_email, n_ip,
         |    len(regexp_extract_all(t2, '${t.pattern}')) AS n_term,
         |    regexp_replace(t2, '${t.pattern}', '${t.marker}', 'g') AS text_red
         |  FROM s2)
         |SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
         |  CAST(n_ip AS BIGINT) AS n_ip, CAST(n_term AS BIGINT) AS n_term,
         |  text_red
         |FROM s3 ORDER BY doc_id""".stripMargin
    },

    "t19_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3),
        |a AS (
        |  SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(c * log2(c)) AS s
        |  FROM c GROUP BY 1, 2)
        |SELECT doc_id, lang, n AS n_tokens,
        |  round(log2(n) - s / n, 6) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,

    "t18_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(t) - 6), i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8),
        |f AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1)
        |SELECT g.doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  round(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS novelty
        |FROM g JOIN f USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,

    "t01_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_uniq,
        |  CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |    / len(string_split(text,' ')) AS avg_len,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t02_quality" -> {
      val all = markersSql.values.mkString(", ")
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ${hitsSql(all)} AS stop_hits,
         |    len(string_split(text,' ')) AS n_tokens,
         |    CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
         |      / len(string_split(text,' ')) AS avg_len
         |  FROM documents)
         |SELECT doc_id, stop_hits,
         |  CAST(stop_hits AS DOUBLE) / n_tokens * 0.3 +
         |    CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0
         |         THEN 0.7 ELSE 0.2 END AS quality
         |FROM q ORDER BY doc_id""".stripMargin
    },

    "t03_langid" -> {
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |    ${hitsSql(markersSql("en"))} AS h_en,
         |    ${hitsSql(markersSql("es"))} AS h_es,
         |    ${hitsSql(markersSql("fr"))} AS h_fr,
         |    ${hitsSql(markersSql("de"))} AS h_de
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 THEN 'unknown'
         |       WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
         |       WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
         |       WHEN h_fr >= h_de THEN 'fr'
         |       ELSE 'de' END AS pred_lang,
         |  (CASE WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 THEN 'unknown'
         |       WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
         |       WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
         |       WHEN h_fr >= h_de THEN 'fr'
         |       ELSE 'de' END) = lang AS is_match
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "t04_fingerprint" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "t06_stopword_removal" -> {
      val all = markersSql.values.mkString(", ")
      s"""SELECT doc_id,
         |  len(list_filter(string_split(lower(text),' '),
         |      x -> x NOT IN ($all))) AS n_kept,
         |  list_filter(string_split(lower(text),' '),
         |      x -> x NOT IN ($all))[1] AS first_kept
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "t07_char_trigrams" ->
      """SELECT doc_id,
        |  len(list_distinct(list_transform(range(1, length(text) - 1),
        |    i -> substring(text, i, 3)))) AS n_uniq_tri
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t05_top_bigrams" ->
      """WITH t AS (SELECT string_split(text,' ') AS toks FROM documents)
        |SELECT u.bg, COUNT(*) AS n
        |FROM t, unnest(list_transform(range(1, len(toks)),
        |  i -> toks[i] || ' ' || toks[i+1])) u(bg)
        |GROUP BY 1 ORDER BY n DESC, bg LIMIT 20""".stripMargin,

    "t11_seq_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    len(string_split(text,' ')) AS n_tok FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - n_tok) // 512 AS BIGINT) AS seq_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t09_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, u AS term, COUNT(*) AS tf
        |  FROM documents, unnest(string_split(text,' ')) t(u)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1))
        |      + 1), 6) AS tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, tf, df, tfidf, rank
        |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "t10_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |base AS (
        |  SELECT doc_id, len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_uniq FROM t),
        |tok AS (
        |  SELECT doc_id, MAX(c) AS top_tok FROM (
        |    SELECT doc_id, COUNT(*) AS c
        |    FROM t, unnest(toks) u(tk) GROUP BY doc_id, tk) x
        |  GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, MAX(c) AS top_bg FROM (
        |    SELECT doc_id, COUNT(*) AS c
        |    FROM t, unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) u(b)
        |    GROUP BY doc_id, b) x
        |  GROUP BY doc_id)
        |SELECT base.doc_id, base.n_tokens,
        |  1.0 - CAST(n_uniq AS DOUBLE) / n_tokens AS dup_token_frac,
        |  CAST(top_tok AS DOUBLE) / n_tokens AS top_token_frac,
        |  CAST(top_bg AS DOUBLE) / (n_tokens - 1) AS top_bigram_frac
        |FROM base JOIN tok USING (doc_id) JOIN bg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "t13_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, u AS tk
        |  FROM documents, unnest(string_split(text,' ')) t(u)),
        |tf AS (SELECT tk, COUNT(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM tf)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  round(CAST(SUM(CAST(-ln(CAST(c AS DOUBLE) / n_corpus)
        |    AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logp
        |FROM toks JOIN tf USING (tk), n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t25_bpe_train" -> graft.ops.Bpe.oracleSql(rounds = 4),

    "t26_bpe_encode" -> graft.ops.Bpe.encodeOracleSql(rounds = 4),

    "t15_bpe_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text,
        |    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +')) AS BIGINT)
        |    AS n_pretokens,
        |  round(CAST(len(regexp_extract_all(text,
        |    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +')) AS DOUBLE)
        |    / len(string_split(text,' ')), 6) AS fertility
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t14_bigram_lm" ->
      """WITH toksl AS (
        |  SELECT doc_id, string_split(text,' ') AS t FROM documents),
        |toks AS (
        |  SELECT doc_id, u AS tk
        |  FROM documents, unnest(string_split(text,' ')) s(u)),
        |ugc AS (SELECT tk, COUNT(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM ugc),
        |bg AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |          i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS u
        |        FROM toksl WHERE len(t) >= 2) s),
        |bgc AS (SELECT w1, w2, COUNT(*) AS cbg FROM bg GROUP BY 1, 2)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  round(CAST(SUM(CAST(-ln(0.7 * (CAST(cbg AS DOUBLE) / c1.c) +
        |      0.3 * (CAST(c2.c AS DOUBLE) / n_corpus))
        |    AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_neg_logp2
        |FROM bg
        |JOIN bgc USING (w1, w2)
        |JOIN ugc c1 ON bg.w1 = c1.tk
        |JOIN ugc c2 ON bg.w2 = c2.tk, n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t12_vocab_growth" ->
      """WITH tf AS (
        |  SELECT source, u AS tk, COUNT(*) AS c
        |  FROM documents, unnest(string_split(text,' ')) t(u)
        |  GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS vocab,
        |  COUNT(CASE WHEN c = 1 THEN 1 END) AS hapax,
        |  round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 6)
        |    AS ttr
        |FROM tf GROUP BY 1 ORDER BY source""".stripMargin,

    "t17_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents)
        |SELECT doc_id, u.i AS chunk_id,
        |  array_to_string(toks[(u.i*24+1):(u.i*24+32)], ' ') AS chunk,
        |  len(toks[(u.i*24+1):(u.i*24+32)]) AS n_tokens
        |FROM t, unnest(list_transform(
        |    range(0, CAST(floor((len(toks)-1)/24) AS BIGINT) + 1),
        |    i -> i)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "t16_blocklist" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(CASE WHEN len(list_filter(string_split(text,' '),
        |    x -> x IN ('dup','deadlock'))) = 0 THEN 1 END) AS n_kept,
        |  round(CAST(COUNT(CASE WHEN len(list_filter(string_split(text,' '),
        |      x -> x IN ('dup','deadlock'))) = 0 THEN 1 END) AS DOUBLE)
        |    / COUNT(*), 6) AS retention
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "t08_quality_filter" -> {
      val all = markersSql.values.mkString(", ")
      s"""WITH q AS (
         |  SELECT lang, source,
         |    CAST(${hitsSql(all)} AS DOUBLE)
         |      / len(string_split(text,' ')) * 0.3 +
         |    CASE WHEN CAST(length(text) - (len(string_split(text,' ')) - 1)
         |           AS DOUBLE) / len(string_split(text,' ')) >= 3.0
         |      AND CAST(length(text) - (len(string_split(text,' ')) - 1)
         |           AS DOUBLE) / len(string_split(text,' ')) <= 10.0
         |      THEN 0.7 ELSE 0.2 END AS q
         |  FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         |  COUNT(CASE WHEN q >= 0.75 THEN 1 END) AS n_kept,
         |  round(CAST(SUM(CAST(q AS DECIMAL(18,9))) AS DOUBLE)
         |    / COUNT(*), 4) AS avg_quality,
         |  round(CAST(COUNT(CASE WHEN q >= 0.75 THEN 1 END) AS DOUBLE)
         |    / COUNT(*), 6) AS retention
         |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "t23_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |postings AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, u AS term,
        |    COUNT(*) AS tf
        |  FROM toks, unnest(t) x(u) GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    AVG(len(string_split(text, ' '))) AS avgdl FROM documents),
        |qterms AS (
        |  SELECT DISTINCT doc_id AS qid, u AS term
        |  FROM toks, unnest(t) x(u) WHERE doc_id < 5),
        |contrib AS (
        |  SELECT q.qid, p.doc_id AS id,
        |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
        |      * (p.tf * 2.2)
        |      / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))
        |      AS DECIMAL(28,18)) AS c
        |  FROM postings p
        |  JOIN df d USING (term) JOIN qterms q USING (term)
        |  CROSS JOIN stats s
        |  WHERE p.doc_id <> q.qid),
        |scored AS (SELECT qid, id, SUM(c) AS sc FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qid, id, sc,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sc DESC, id) AS rank
        |  FROM scored)
        |SELECT qid, id, round(CAST(sc AS DOUBLE), 6) AS score, rank
        |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "t24_nb_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, (lang = 'en') AS tgt,
        |    string_split(text,' ') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, tgt, u AS term FROM toks, unnest(t) x(u)),
        |dtf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |model AS (
        |  SELECT term, COUNT(CASE WHEN tgt THEN 1 END) AS c_tgt,
        |    COUNT(*) AS c_all
        |  FROM tok GROUP BY 1),
        |tstats AS (
        |  SELECT CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
        |    CAST(SUM(c_all) - SUM(c_tgt) AS BIGINT) AS n_oth,
        |    COUNT(*) AS v
        |  FROM model),
        |dstats AS (
        |  SELECT COUNT(CASE WHEN lang = 'en' THEN 1 END) AS nd_tgt,
        |    COUNT(*) AS nd_all FROM documents),
        |contrib AS (
        |  SELECT d.doc_id,
        |    CAST(d.tf * (round(ln((m.c_tgt + 1.0) / (s.n_tgt + s.v)), 6)
        |               - round(ln((m.c_all - m.c_tgt + 1.0)
        |                          / (s.n_oth + s.v)), 6))
        |      AS DECIMAL(28,18)) AS c
        |  FROM dtf d JOIN model m USING (term) CROSS JOIN tstats s),
        |scored AS (SELECT doc_id, SUM(c) AS sc FROM contrib GROUP BY 1),
        |pr AS (
        |  SELECT CAST(round(ln(CAST(nd_tgt AS DOUBLE) / nd_all), 6)
        |            - round(ln(CAST(nd_all - nd_tgt AS DOUBLE) / nd_all), 6)
        |         AS DECIMAL(28,18)) AS p
        |  FROM dstats)
        |SELECT t.doc_id, t.lang, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  round(CAST(COALESCE(s.sc, CAST(0 AS DECIMAL(28,18))) + pr.p
        |    AS DOUBLE), 6) AS nb_score,
        |  round(CAST(COALESCE(s.sc, CAST(0 AS DECIMAL(28,18))) + pr.p
        |    AS DOUBLE), 6) > 0 AS keep
        |FROM toks t LEFT JOIN scored s USING (doc_id) CROSS JOIN pr
        |ORDER BY doc_id""".stripMargin
  )
}
