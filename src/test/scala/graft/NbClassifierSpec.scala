package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NbClassifier

/** Closed-form coverage for the Naive-Bayes classifier filter: the
  * exact add-one multinomial posterior on a 4-doc corpus, the keep
  * decision at log-odds 0, and the one-row-per-doc contract. The
  * cross-engine decimal/round discipline is the driver's t24 oracle. */
class NbClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("NB filter matches the hand-computed add-one posterior and keeps " +
      "exactly the target-looking docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a b"),
      (3L, "de", "c c"),
      (4L, "de", "b c")
    ).toDF("doc_id", "lang", "text")

    val got = NbClassifier.scores(docs, "doc_id", "text", $"lang" === "en")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.size == 4)

    // model by hand: n_tgt=5, n_oth=4, V=3; priors 2/4 vs 2/4 → 0
    // theta_tgt: a 4/8, b 3/8, c 1/8 ; theta_oth: a 1/7, b 2/7, c 4/7
    val wA = r6(math.log(4.0 / 8)) - r6(math.log(1.0 / 7))
    val wB = r6(math.log(3.0 / 8)) - r6(math.log(2.0 / 7))
    val wC = r6(math.log(1.0 / 8)) - r6(math.log(4.0 / 7))
    val want = Map(
      1L -> (3L, r6(2 * wA + wB), true),
      2L -> (2L, r6(wA + wB), true),
      3L -> (2L, r6(2 * wC), false),
      4L -> (2L, r6(wB + wC), false))
    want.foreach { case (id, (nt, sc, keep)) =>
      val (gnt, gsc, gkeep) = got(id)
      assert(gnt == nt, s"doc $id n_tokens")
      assert(math.abs(gsc - sc) < 1e-9, s"doc $id: got $gsc, want $sc")
      assert(gkeep == keep, s"doc $id keep")
    }
  }

  test("unbalanced priors shift every score by the same log-odds; " +
      "null predicate rows count as non-target") {
    import spark.implicits._
    // same docs plus one more non-target doc with a null lang: the
    // prior becomes ln(2/5) - ln(3/5) and doc 5's tokens train the
    // non-target class
    val docs = Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a b"),
      (3L, "de", "c c"),
      (4L, "de", "b c"),
      (5L, null.asInstanceOf[String], "c c")
    ).toDF("doc_id", "lang", "text")
    val got = NbClassifier.scores(docs, "doc_id", "text", $"lang" === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 5)

    // n_tgt=5, n_oth=6, V=3; priors 2/5 vs 3/5
    val wA = r6(math.log(4.0 / 8)) - r6(math.log(1.0 / 9))
    val wC = r6(math.log(1.0 / 8)) - r6(math.log(6.0 / 9))
    val prior = r6(math.log(2.0 / 5)) - r6(math.log(3.0 / 5))
    assert(math.abs(got(5L) - r6(2 * wC + prior)) < 1e-9)
    // doc 1 decomposes to the same prior + its token terms
    val wB = r6(math.log(3.0 / 8)) - r6(math.log(2.0 / 9))
    assert(math.abs(got(1L) - r6(2 * wA + wB + prior)) < 1e-9)
    assert(got(1L) > got(3L)) // separability survives the prior shift
  }

  test("hashed-feature mode: collision-free buckets reproduce raw mode " +
      "bit-for-bit; forced collisions match a reference over the " +
      "engine's own buckets; the model broadcasts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a b"),
      (3L, "de", "c c"),
      (4L, "de", "b c")
    ).toDF("doc_id", "lang", "text")
    def run(b: Option[Int]) =
      NbClassifier.scores(docs, "doc_id", "text", $"lang" === "en", b)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    // 2^20 buckets over a 3-token vocab: no collisions → identical
    val raw = run(None)
    assert(run(Some(1 << 20)) == raw)

    // b = 2 forces real collisions; reference buckets via the
    // engine's own hash (xxhash64 → pmod), the DsirSpec discipline
    val bucketOf = Seq("a", "b", "c").toDF("w")
      .select($"w", pmod(xxhash64($"w"), lit(2L)).cast("string").as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val corpus = Seq((1L, true, "a a b"), (2L, true, "a b"),
      (3L, false, "c c"), (4L, false, "b c"))
    val toks = corpus.map { case (id, tgt, t) =>
      (id, tgt, t.split(" ").toSeq.map(bucketOf)) }
    val (tT, tO) = (toks.filter(_._2).flatMap(_._3),
      toks.filterNot(_._2).flatMap(_._3))
    val v = (tT ++ tO).distinct.size
    val cT = tT.groupBy(identity).view.mapValues(_.size).toMap
    val cO = tO.groupBy(identity).view.mapValues(_.size).toMap
    def w(f: String) =
      r6(math.log((cT.getOrElse(f, 0) + 1.0) / (tT.size + v))) -
        r6(math.log((cO.getOrElse(f, 0) + 1.0) / (tO.size + v)))
    val prior = 0.0 // 2 target / 2 other
    val got2 = run(Some(2))
    toks.foreach { case (id, _, fs) =>
      val want = r6(fs.map(w).sum + prior)
      assert(math.abs(got2(id) - want) < 1e-9,
        s"doc $id: got ${got2(id)}, want $want")
    }

    val plan = NbClassifier.scores(docs, "doc_id", "text",
      $"lang" === "en", Some(4096)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("persisted model round-trips bit-for-bit: a loaded model scores " +
      "the training corpus exactly like scores(); unseen tokens get the " +
      "smoothed zero-count weight; bucketing travels with the model") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a b"),
      (3L, "de", "c c"),
      (4L, "de", "b c")
    ).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "nbmodel")
      .toString

    NbClassifier.save(
      NbClassifier.train(docs, "doc_id", "text", $"lang" === "en"), dir)
    val loaded = NbClassifier.load(spark, dir)
    val direct = NbClassifier.scores(docs, "doc_id", "text", $"lang" === "en")
      .collect().map(_.toSeq).toSet
    val served = NbClassifier.scoreWith(docs, "doc_id", "text", loaded)
      .collect().map(_.toSeq).toSet
    assert(served == direct)

    // a NEW doc with one seen and one unseen token: the OOV term gets
    // the model's own smoothed zero-count weight
    val fresh = Seq((9L, "zzz a")).toDF("doc_id", "text")
    val got = NbClassifier.scoreWith(fresh, "doc_id", "text", loaded)
      .collect().head.getDouble(2)
    val wA = r6(math.log(4.0 / 8)) - r6(math.log(1.0 / 7))
    val wOov = r6(math.log(1.0 / 8)) - r6(math.log(1.0 / 7))
    assert(math.abs(got - r6(wA + wOov)) < 1e-9, s"got $got")

    // a hashed model scores through its stored bucketing — the same
    // values as an in-memory hashed model, even for unseen tokens
    val dir2 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "nbmodelh")
      .toString
    val hashed = NbClassifier.train(docs, "doc_id", "text",
      $"lang" === "en", numBuckets = Some(2))
    NbClassifier.save(hashed, dir2)
    val hServed = NbClassifier
      .scoreWith(fresh, "doc_id", "text", NbClassifier.load(spark, dir2))
      .collect().head.getDouble(2)
    val hDirect = NbClassifier.scoreWith(fresh, "doc_id", "text", hashed)
      .collect().head.getDouble(2)
    assert(hServed == hDirect)
  }

  test("applyDelta: a delta-maintained model equals a from-scratch " +
      "retrain bit-for-bit; empty delta is identity; deleting " +
      "everything empties the vocabulary; bucketing is respected") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val base = Seq((1L, "en", "a a b"), (2L, "de", "b c"))
      .toDF("doc_id", "lang", "text")
    def rows(m: (DataFrame, DataFrame)) =
      (m._1.collect().map(_.toSeq).toSet, m._2.collect().map(_.toSeq).toSet)
    val m0 = NbClassifier.train(base, "doc_id", "text", $"lang" === "en")

    // insert doc 3, delete doc 2 (before-image text, the CDC contract)
    val changes = Seq((3L, "en", "c d", "I"), (2L, "de", "b c", "D"))
      .toDF("doc_id", "lang", "text", "op")
    val after = Seq((1L, "en", "a a b"), (3L, "en", "c d"))
      .toDF("doc_id", "lang", "text")
    val m1 = NbClassifier.applyDelta(m0, changes, "doc_id", "text",
      $"lang" === "en", $"op")
    assert(rows(m1) ==
      rows(NbClassifier.train(after, "doc_id", "text", $"lang" === "en")))

    // empty delta = identity
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "text", "op")
    assert(rows(NbClassifier.applyDelta(m0, empty, "doc_id", "text",
      $"lang" === "en", $"op")) == rows(m0))

    // delete everything → empty vocabulary, zeroed stats
    val wipe = Seq((1L, "en", "a a b", "D"), (2L, "de", "b c", "D"))
      .toDF("doc_id", "lang", "text", "op")
    val m3 = NbClassifier.applyDelta(m0, wipe, "doc_id", "text",
      $"lang" === "en", $"op")
    assert(m3._1.count() == 0)
    val st = m3._2.collect().head
    assert(st.getAs[Long]("n_tgt") == 0 && st.getAs[Long]("n_oth") == 0 &&
      st.getAs[Long]("v") == 0 && st.getAs[Long]("nd_tgt") == 0 &&
      st.getAs[Long]("nd_all") == 0)

    // a hashed model's delta buckets through the STORED mode
    val h0 = NbClassifier.train(base, "doc_id", "text", $"lang" === "en",
      numBuckets = Some(2))
    val h1 = NbClassifier.applyDelta(h0, changes, "doc_id", "text",
      $"lang" === "en", $"op")
    assert(rows(h1) == rows(NbClassifier.train(after, "doc_id", "text",
      $"lang" === "en", numBuckets = Some(2))))
  }

  test("null text keeps its row and scores as the prior alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a"),
      (2L, "de", "b"),
      (3L, "de", null.asInstanceOf[String])
    ).toDF("doc_id", "lang", "text")
    val rows = NbClassifier.scores(docs, "doc_id", "text", $"lang" === "en")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getDouble(2))))
      .toMap
    assert(rows.size == 3)
    val prior = r6(math.log(1.0 / 3)) - r6(math.log(2.0 / 3))
    assert(rows(3L)._1.isEmpty) // length of a null text is undefined
    assert(math.abs(rows(3L)._2 - r6(prior)) < 1e-9)
  }
}
