package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EntropyKernel

/** Algebraic check of the fused token-entropy kernel against an
  * independent map-of-counts reference over arbitrary strings: the
  * kernel's byte-slice index sort must produce exactly the counts a
  * hash map of whole tokens would, on any input, including empty
  * tokens from leading/trailing/double spaces and multi-byte UTF-8.
  * Pure JVM — no Spark session. */
class EntropyPropertySpec extends AnyFunSuite {

  private def reference(s: String): Double = {
    // split(-1): preserve empty tokens, n = separators + 1 — the
    // string_split semantics the oracle and Spark's split() share
    val toks = s.split(" ", -1)
    val n = toks.length
    if (n == 1) return 0.0
    val counts = toks.groupBy(identity).values.map(_.length)
    val ln2 = math.log(2.0)
    val sAcc = counts.collect {
      case c if c > 1 => c * (math.log(c.toDouble) / ln2)
    }.sum
    math.log(n.toDouble) / ln2 - sAcc / n
  }

  private val token: Gen[String] = Gen.oneOf(
    Gen.const(""),                                  // empty token
    Gen.oneOf("a", "b", "ab", "ba", "aa"),          // collision-prone
    Gen.listOfN(3, Gen.choose('a', 'd')).map(_.mkString),
    Gen.oneOf("héllo", "héllø", "日本語", "日本誤", "💡", "💬"))

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 80)
    ts <- Gen.listOfN(n, token)
  } yield ts.mkString(" ")

  test("kernel equals the count-map reference on arbitrary token mixes") {
    val prop = Prop.forAll(text) { s =>
      val got = EntropyKernel.tokenEntropy(UTF8String.fromString(s))
      val want = reference(s)
      math.abs(got - want) < 1e-12
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("edge semantics: empty / single / uniform / boundary spaces") {
    def h(s: String) = EntropyKernel.tokenEntropy(UTF8String.fromString(s))
    assert(h("") == 0.0)            // one empty token
    assert(h("word") == 0.0)        // one token
    assert(h("a a a a") == 0.0)     // uniform: zero entropy
    assert(math.abs(h("a b a b") - 1.0) < 1e-12) // two equiprobable
    assert(math.abs(h("a b c d") - 2.0) < 1e-12) // four equiprobable
    // " a" = ["", "a"]: two distinct tokens, H = 1
    assert(math.abs(h(" a") - 1.0) < 1e-12)
    // "a  a" = ["a", "", "a"]: counts (2,1), H = log2(3) - 2/3
    assert(math.abs(h("a  a") - (math.log(3) / math.log(2) - 2.0 / 3)) < 1e-12)
  }

  test("malformed UTF-8 never reads out of bounds and stays finite") {
    // 0x20 can't occur inside a multi-byte sequence, so the byte walk
    // is total on ANY byte array — the kernel must neither throw nor
    // return NaN/Inf
    val anyBytes = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    val prop = Prop.forAll(anyBytes) { bs =>
      val v = EntropyKernel.tokenEntropy(UTF8String.fromBytes(bs))
      !v.isNaN && !v.isInfinite && v >= 0.0
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
