package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, TextAnalysis}

/** The two corpus-gating ops behind t16/d14: term-blocklist filtering
  * and token-budget sampling. */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("blocklist: the inline expression path and the broadcast " +
      "semi-join path flag exactly the same documents") {
    import spark.implicits._
    // the two paths exist for different blocklist sizes (literal array
    // vs relation); a user switching as the list grows must see the
    // identical kept set
    val docs = graft.util.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val terms = Seq("dup", "deadlock") // 'deadlock' is corpus-absent
    val viaExpr = docs
      .filter(TextAnalysis.blocked($"text", terms))
      .select($"doc_id").as[Long].collect().toSet
    val viaJoin = TextAnalysis
      .blockedDocs(docs, "doc_id", "text", terms.toDF("t"))
      .as[Long].collect().toSet
    assert(viaExpr.nonEmpty, "fixture must contain blocklisted docs")
    assert(viaExpr == viaJoin)
  }

  test("redact: PII shapes (email, phone, IPv4, digit runs) replace and " +
      "count correctly on crafted text") {
    import spark.implicits._
    // the t20 gate's corpus has no digits/emails — the PII shapes are
    // proven here, live, on text that contains them
    val rows = Seq(
      (1L, "mail me at jo.doe+x@ex-corp.io or root@a.bc today"),
      (2L, "call 555-123-4567 or 555 987 6543 now"),
      (3L, "host 10.0.255.1 and 192.168.0.12, id 12345678"),
      (4L, "clean text with no sensitive content at all"),
      (5L, "edge: a@b.c is too short a TLD, 12.34 is not an IP")
    ).toDF("doc_id", "text")
    val rules = TextAnalysis.PiiRules
    val counts = TextAnalysis.redactCounts($"text", rules)
    val out = rows.select($"doc_id",
        counts(0).as("ne"), counts(1).as("np"),
        counts(2).as("ni"), counts(3).as("nn"),
        TextAnalysis.redacted($"text", rules).as("red"))
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 0L, 0L, 0L,
      "mail me at <EMAIL> or <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 2L, 0L, 0L,
      "call <PHONE> or <PHONE> now")))
    assert(out(2) == ((3L, 0L, 0L, 2L, 1L,
      "host <IP> and <IP>, id <NUM>")))
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L,
      "clean text with no sensitive content at all")))
    // a@b.c: single-char TLD fails {2,}; 12.34 is no IPv4; neither has
    // a 6-digit run → untouched
    assert(out(4) == ((5L, 0L, 0L, 0L, 0L,
      "edge: a@b.c is too short a TLD, 12.34 is not an IP")))
  }

  test("redact: rules apply sequentially — an earlier rule consumes " +
      "spans a later rule can no longer match, and counts agree with " +
      "replacements") {
    import spark.implicits._
    // 5551234567 inside a phone-shaped span: PHONE fires first, so the
    // NUM rule must NOT count the digits it consumed; a bare digit run
    // elsewhere still matches NUM
    val rows = Seq((1L, "p 555-123-4567 n 987654321")).toDF("doc_id", "text")
    val rules = TextAnalysis.PiiRules
    val counts = TextAnalysis.redactCounts($"text", rules)
    val (np, nn, red) = rows.select(
        counts(1).as("np"), counts(3).as("nn"),
        TextAnalysis.redacted($"text", rules).as("red"))
      .as[(Long, Long, String)].head()
    assert(np == 1L && nn == 1L)
    assert(red == "p <PHONE> n <NUM>")
    // reversed order: NUM-family first would tear the phone apart —
    // order is part of the contract, so the reversed pipeline must
    // visibly differ (the phone's digit groups are 3-4 digits, NUM
    // needs 6+, so here reversal still leaves PHONE intact; use a
    // continuous 10-digit number to show consumption)
    val cont = Seq((1L, "n 5551234567")).toDF("doc_id", "text")
    val fwd = cont.select(TextAnalysis.redacted($"text", rules).as("r"))
      .as[String].head()
    assert(fwd == "n <NUM>") // no separators → not PHONE, NUM takes it
  }

  test("tokenBudgetKeep: keeps in order until the budget, drops the " +
      "doc that crosses it, strata are independent") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, "t t t"),        // 3 tokens, cum 3
      ("a", 2L, "t t t t"),      // 4 tokens, cum 7
      ("a", 3L, "t t"),          // 2 tokens, cum 9 > 8 → dropped
      ("a", 4L, "t"),            // later doc: cum 10 → dropped too
      ("b", 1L, "t t t t t t t t"), // 8 tokens, cum 8 = budget → kept
      ("b", 2L, "t")             // cum 9 → dropped
    ).toDF("source", "doc_id", "text")
    val kept = Sampling.tokenBudgetKeep(docs, "source", "doc_id",
        TextAnalysis.tokenCount($"text"), budget = 8L)
      .filter($"keep")
      .select($"source", $"doc_id").as[(String, Long)].collect().toSet
    assert(kept == Set(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("temperatureMix: alpha=0.5 flattens the head toward uniform; " +
      "shares match the closed form and sum to 1") {
    import spark.implicits._
    // en:es token mass 9:1 → raw p (0.9, 0.1); sqrt-flattened shares
    // (0.75, 0.25) — the head gives up mass, the tail gains
    val docs = Seq(
      ("en", ("t " * 899).trim + " t"),   // 900 tokens
      ("es", ("t " * 99).trim + " t")     // 100 tokens
    ).toDF("lang", "text")
    val out = Sampling.temperatureMix(docs, "lang",
        size(split($"text", " ")), alpha = 0.5)
      .orderBy($"lang").collect()
    val en = out(0); val es = out(1)
    assert(en.getAs[Long]("n_tokens") == 900L)
    assert(es.getAs[Long]("n_tokens") == 100L)
    assert(math.abs(en.getAs[Double]("p_raw") - 0.9) < 1e-9)
    // closed form replicated with the op's own arithmetic
    val (fe, fs) = (math.sqrt(900.0 / 1000), math.sqrt(100.0 / 1000))
    val z = BigDecimal(fe).setScale(18, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(fs).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(en.getAs[Double]("mix_share") == r6(fe / z.toDouble))
    assert(es.getAs[Double]("mix_share") == r6(fs / z.toDouble))
    // flattening direction: head share < raw p, tail share > raw p
    assert(en.getAs[Double]("mix_share") < 0.9)
    assert(es.getAs[Double]("mix_share") > 0.1)
  }

  test("t23 BM25: closed form on a crafted corpus — tf monotone, " +
      "length-normalized, idf-weighted, self excluded") {
    import spark.implicits._
    // qid=1 queries {apple, rare}. Corpus designed so every BM25
    // property is observable: 10 beats 11 (higher tf, same dl), 12
    // beats 11 (same tf, shorter doc), 13 is boosted by the rare
    // term's idf, 14 matches nothing, and the query doc itself never
    // appears as a hit.
    val docs = Seq(
      (1L, "apple rare"),
      (10L, "apple apple banana banana"),
      (11L, "apple banana banana banana"),
      (12L, "apple banana"),
      (13L, "rare banana banana banana"),
      (14L, "banana banana banana banana"))
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("t23_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    assert(got.forall(_._1 == 1L), s"only qid=1 expected: ${got.toSeq}")
    assert(!got.exists(_._2 == 1L), "query doc must not rank itself")
    assert(!got.exists(_._2 == 14L), "a doc with no query term never scores")

    // independent closed-form reference (same formula, recomputed from
    // raw token counts — not through any query code)
    val toks = docs.toMap.view.mapValues(_.split(" ").toSeq).toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = toks.values.count(_.contains(t))
    def bm25(id: Long): Double = Seq("apple", "rare").map { t =>
      val tf = toks(id).count(_ == t)
      if (tf == 0) 0.0
      else {
        val df = dfOf(t)
        val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        idf * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl))
      }
    }.sum
    val expected = Seq(10L, 11L, 12L, 13L).map(id => id -> bm25(id))
      .sortBy { case (id, sc) => (-sc, id) }
    assert(got.map(_._2).toSeq == expected.map(_._1),
      s"rank order: got ${got.toSeq} expected $expected")
    got.foreach { case (_, id, score, _) =>
      val e = BigDecimal(expected.toMap.apply(id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - e) < 2e-6, s"doc $id: $score vs $e")
    }
    // the designed property checks, independent of the formula dup
    val sc = got.map(t => t._2 -> t._3).toMap
    assert(sc(10L) > sc(11L), "higher tf must score higher at equal dl")
    assert(sc(12L) > sc(11L), "shorter doc must score higher at equal tf")
    assert(sc(13L) > sc(11L), "rare-term idf must beat common-term match")
  }

  test("d22 source overlap: exact gram-set Jaccard/containment on a " +
      "crafted 3-source corpus; sub-8-token docs ignored") {
    import spark.implicits._
    val w = (1 to 9).map(i => s"w$i")
    val docs = Seq(
      (1L, w.mkString(" "), "A"),             // grams {w1..w8, w2..w9}
      (2L, w.take(8).mkString(" "), "B"),      // grams {w1..w8}
      (3L, (1 to 8).map(i => s"z$i").mkString(" "), "C"), // disjoint
      (4L, "too short", "C"))                  // <8 tokens: no grams
    val dir = java.nio.file.Files.createTempDirectory("srcovl").toString
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d22_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // only (A,B) shares anything; C's gram set is disjoint and its
    // short doc contributes nothing
    assert(got.toSeq == Seq(("A", "B", 2L, 1L, 1L, 0.5, 1.0)), got.toSeq)
  }
}
