package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dsir

/** DSIR importance scoring (t21): the hashed scale mode must agree
  * with an independent in-memory reference, the exact mode likewise,
  * and the hashed mode's stat join must broadcast (the property that
  * makes it the 100 TB path).
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val alpha = 0.5

  /** In-memory reference: per-doc Σ log2(p̂_t(f)/p̂_r(f)) over bigram
    * occurrences, features produced by `feat`. */
  private def reference(
      docs: Seq[(Long, String, Boolean)],
      feat: String => String): Map[Long, (Double, Long)] = {
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Nil
      else w.sliding(2).map(p => feat(p(0) + " " + p(1))).toSeq
    }
    val all = docs.flatMap { case (id, t, _) => bigrams(t) }
    val tgt = docs.filter(_._3).flatMap { case (_, t, _) => bigrams(t) }
    val cr = all.groupBy(identity).map { case (f, v) => f -> v.size.toLong }
    val ct = tgt.groupBy(identity).map { case (f, v) => f -> v.size.toLong }
    val (nr, nt, v) = (all.size.toLong, tgt.size.toLong, cr.size.toLong)
    docs.map { case (id, t, _) =>
      val bs = bigrams(t)
      val s = bs.map { f =>
        val pt = (ct.getOrElse(f, 0L) + alpha) / (nt + alpha * v)
        val pr = (cr(f) + alpha) / (nr + alpha * v)
        math.log(pt / pr) / math.log(2.0)
      }.sum
      id -> ((s, bs.size.toLong))
    }.toMap
  }

  private def corpus: Seq[(Long, String, Boolean)] = {
    val rnd = new scala.util.Random(21)
    val vocabT = Seq("the", "cat", "sat", "on", "mat", "a")
    val vocabR = Seq("le", "chat", "est", "sur", "tapis", "un")
    (0L until 60L).map { i =>
      val tgt = i % 2 == 0
      val vocab = if (tgt) vocabT else vocabR
      val mixed = vocab ++ vocabT.take(2) // shared mass across domains
      val n = 1 + rnd.nextInt(12) // includes 1-token docs (no bigrams)
      (i, Seq.fill(n)(mixed(rnd.nextInt(mixed.size))).mkString(" "), tgt)
    }
  }

  test("exact mode matches the in-memory reference") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text", "tgt")
    val got = Dsir.scores(docs, "id", "text", col("tgt"), alpha)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    val ref = reference(corpus, identity)
    corpus.foreach { case (id, t, _) =>
      val (rs, rn) = ref(id)
      if (rn == 0) assert(!got.contains(id)) // no bigrams -> no score row
      else {
        val (gs, gn) = got(id)
        assert(gn == rn, s"id=$id n_bigrams")
        assert(math.abs(gs - rs) < 1e-9, s"id=$id got=$gs ref=$rs")
      }
    }
  }

  test("hashed mode matches a reference using the same buckets") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text", "tgt")
    val b = 32 // small enough to force real collisions
    val got = Dsir.scores(docs, "id", "text", col("tgt"), alpha,
        numBuckets = Some(b))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2)))).toMap
    // reference buckets via the engine's own hash (xxhash64 -> pmod),
    // evaluated once per distinct bigram through a tiny Spark job
    val grams = corpus.flatMap { case (_, t, _) =>
      val w = t.split(" ", -1)
      if (w.length < 2) Nil else w.sliding(2).map(p => p(0) + " " + p(1)).toSeq
    }.distinct
    val bucketOf = grams.toDF("g")
      .select(col("g"), org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.xxhash64(col("g")),
          org.apache.spark.sql.functions.lit(b.toLong)).cast("string").as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val ref = reference(corpus, bucketOf)
    corpus.foreach { case (id, _, _) =>
      val (rs, rn) = ref(id)
      if (rn == 0) assert(!got.contains(id), // mirror the exact-mode gate:
        s"id=$id: spurious row for a zero-bigram doc in hashed mode")
      else {
        val (gs, gn) = got(id)
        assert(gn == rn && math.abs(gs - rs) < 1e-9, s"id=$id")
      }
    }
  }

  test("hashed mode broadcasts the stat relation (no shuffle on the feature)") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text", "tgt")
    val plan = Dsir.scores(docs, "id", "text", col("tgt"), alpha,
      numBuckets = Some(4096)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("divergence matches an in-memory truncated-KL reference and ranks " +
      "target-aligned strata below shifted ones") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocabT = Seq("alpha", "beta", "gamma", "delta")
    val vocabB = Seq("uno", "dos", "tres", "quatro")
    // stratum A: pure target vocabulary (and IS the target); stratum
    // B: disjoint vocabulary; stratum C: half-and-half
    val rows = (0 until 90).map { i =>
      val (g, vocab, tgt) = i % 3 match {
        case 0 => ("A", vocabT, true)
        case 1 => ("B", vocabB, false)
        case _ => ("C", vocabT ++ vocabB, false)
      }
      val n = 3 + rnd.nextInt(8)
      (g, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), tgt)
    }
    val df = rows.toDF("g", "text", "tgt")
    val got = graft.ops.Dsir.divergence(df, "g", "text", col("tgt"), alpha)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getLong(1)))).toMap

    // independent reference
    val toks = rows.map { case (g, t, tgt) => (g, t.split(" ", -1).toSeq, tgt) }
    val all = toks.flatMap(_._2)
    val tgtToks = toks.filter(_._3).flatMap(_._2)
    val v = all.distinct.size.toLong
    val nt = tgtToks.size.toLong
    val ctM = tgtToks.groupBy(identity).map { case (w, x) => w -> x.size.toLong }
    Seq("A", "B", "C").foreach { g =>
      val gw = toks.filter(_._1 == g).flatMap(_._2)
      val ns = gw.size.toLong
      val ref = gw.groupBy(identity).map { case (w, x) =>
        val ps = (x.size + alpha) / (ns + alpha * v)
        val pt = (ctM.getOrElse(w, 0L) + alpha) / (nt + alpha * v)
        ps * (math.log(ps / pt) / math.log(2.0))
      }.sum
      val (gd, gn) = got(g)
      assert(gn == ns, s"g=$g n_tokens")
      assert(math.abs(gd - ref) < 1e-6, s"g=$g got=$gd ref=$ref")
    }
    assert(got("A")._1 < got("C")._1 && got("C")._1 < got("B")._1,
      s"expected A < C < B, got $got")
  }

  test("empty target is well-defined (uniform target model, finite scores)") {
    import spark.implicits._
    val docs = corpus.toDF("id", "text", "tgt")
    // no target mass -> p̂_t is the uniform 1/|V| for every feature;
    // scores stay finite (rare features CAN score positive: 1/|V| may
    // exceed a smoothed singleton's raw probability) and match the
    // reference under an all-false predicate
    val got = Dsir.scores(docs, "id", "text",
        org.apache.spark.sql.functions.lit(false), alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    got.values.foreach(s => assert(!s.isNaN && !s.isInfinite))
    val ref = reference(corpus.map { case (id, t, _) => (id, t, false) }, identity)
    got.foreach { case (id, s) =>
      assert(math.abs(s - ref(id)._1) < 1e-9, s"id=$id")
    }
  }
}
