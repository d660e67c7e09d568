package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** The BPE merge-loop trainer vs a straightforward driver-side
  * reference implementation of Sennrich's algorithm (explicit
  * leftmost-non-overlapping merge scan). The property corpus is built
  * over a tiny alphabet so ties, `aaa…` runs (the odd/even
  * alternation case), and merged-token-reuse across rounds all occur
  * constantly — the cases where a wrong fold or tie-break diverges
  * within a round or two. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- reference implementation (driver-side, obviously-correct) --
  private def mergeScan(s: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[String, (Vector[String], Long)] = words
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, ws) =>
        w -> (w.map(_.toString).toVector, ws.size.toLong)
      }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((_, (syms, c)) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((round, l, r, c))
        vocab = vocab.map { case (w, (syms, c)) =>
          w -> (mergeScan(syms, l, r), c)
        }
      }
    }
    out.result()
  }

  private def trainOn(words: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    // several docs so the corpus-side word count aggregates for real
    val docs = words.grouped(math.max(1, words.size / 3)).toSeq
      .map(_.mkString(" ")).toDF("text")
    Bpe.train(docs, "text", rounds)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("merge table equals the reference trainer on a run-heavy " +
      "tie-heavy corpus (5 rounds)") {
    val words = Seq(
      "aaaa", "aaa", "aa", "aaaa", "abab", "abab", "abab", "baba",
      "bbbb", "abba", "aabb", "aabb", "ab", "ba", "a", "b", "aaab")
    assert(trainOn(words, 5) == refTrain(words, 5))
  }

  test("merged tokens participate in later rounds (chained merges) " +
      "and counts stay corpus-weighted") {
    // "abcd" x4 forces ab, then ab+c or similar chains within 3 rounds
    val words = Seq.fill(4)("abcd") ++ Seq.fill(3)("abce") ++
      Seq.fill(2)("abc") ++ Seq("dce", "ce", "cd")
    val got = trainOn(words, 4)
    assert(got == refTrain(words, 4))
    // the chain actually happened: some round merged a MULTI-char lhs
    assert(got.exists { case (_, l, r, _) => (l + r).length > 2 })
  }

  test("pseudo-random corpora over {a,b,c}: trainer ≡ reference " +
      "across seeds") {
    // deterministic LCG so the spec is reproducible (no Date/Random)
    var state = 12345L
    def next(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % n).toInt + n) % n
    }
    for (trial <- 0 until 3) {
      val words = (0 until 40).map { _ =>
        val len = 1 + next(6)
        (0 until len).map(_ => "abc" (next(3))).mkString
      }
      val rounds = 3 + next(3)
      assert(trainOn(words, rounds) == refTrain(words, rounds),
        s"diverged on trial $trial (rounds=$rounds)")
    }
  }

  // encode reference: the merge rules in training order, each a
  // leftmost-non-overlapping scan — what any BPE runtime does
  private def refEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) {
      case (syms, (l, r)) => mergeScan(syms, l, r)
    }

  test("encode: per-doc token multiset equals the reference scan — " +
      "training words AND unseen words (the generalization the " +
      "t26 oracle can't see)") {
    import spark.implicits._
    val trainWords = Seq("aaaa", "abab", "abab", "baba", "aabb", "ab",
      "aaab")
    val merges = refTrain(trainWords, 4).map { case (_, l, r, _) =>
      (l, r)
    }
    assert(merges.size == 4)
    // unseen: longer runs, novel chars, a doc with repeated words and
    // a double space (empty token drops on both sides)
    val docs = Seq(
      (1L, "aaaa abab xyz"),
      (2L, "bbbb  aab abababa aab"),
      (3L, "q")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "text", "doc_id", merges)
      .as[(Long, String, Long)].collect().toSeq.sorted
    val want = Seq(
      1L -> Seq("aaaa", "abab", "xyz"),
      2L -> Seq("bbbb", "aab", "abababa", "aab"),
      3L -> Seq("q")).flatMap { case (id, ws) =>
        ws.flatMap(w => refEncode(w, merges))
          .groupBy(identity).map { case (t, ts) => (id, t, ts.size.toLong) }
      }.sorted
    assert(got == want)
  }

  test("encode ≡ reference on pseudo-random corpora and rule tables " +
      "across seeds (runs, ties, chained merges)") {
    import spark.implicits._
    var state = 777L
    def next(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % n).toInt + n) % n
    }
    for (trial <- 0 until 2) {
      val trainWords = (0 until 30).map { _ =>
        (0 until (1 + next(5))).map(_ => "abc" (next(3))).mkString
      }
      val merges = refTrain(trainWords, 4).map { case (_, l, r, _) =>
        (l, r)
      }
      val encWords = (0 until 25).map { _ =>
        (0 until (1 + next(7))).map(_ => "abcd" (next(4))).mkString
      }
      val docs = encWords.grouped(5).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val got = Bpe.encode(docs, "text", "doc_id", merges)
        .as[(Long, String, Long)].collect().toSeq.sorted
      val want = encWords.grouped(5).zipWithIndex.flatMap {
        case (ws, i) =>
          ws.flatMap(w => refEncode(w, merges)).groupBy(identity)
            .map { case (t, ts) => (i.toLong, t, ts.size.toLong) }
      }.toSeq.sorted
      assert(got == want, s"diverged on trial $trial")
    }
  }

  test("exhausted vocabulary stops early: fewer merges than rounds " +
      "when no pair remains") {
    // single-char words only — zero pairs, zero merges
    assert(trainOn(Seq("a", "b", "a"), 3).isEmpty)
    // one mergeable pair then exhaustion
    val got = trainOn(Seq("ab", "ab", "a", "b"), 5)
    assert(got == refTrain(Seq("ab", "ab", "a", "b"), 5))
    assert(got.size < 5)
  }
}
