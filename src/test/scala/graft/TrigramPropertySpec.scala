package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TrigramKernel

/** Algebraic check of the fused trigram kernel against an independent
  * code-point reference over arbitrary unicode (1–4-byte UTF-8): the
  * kernel's byte-walk decode must agree with Java's codePoints() on
  * every valid string, not just the fixture alphabet. Pure JVM — no
  * Spark session, so the property runs thousands of cases in
  * milliseconds. */
class TrigramPropertySpec extends AnyFunSuite {

  private def reference(s: String): Long = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) math.min(cps.length.toLong, 1L)
    else cps.sliding(3).map(_.toSeq).toSet.size.toLong
  }

  // valid non-surrogate code points across all UTF-8 widths
  private val cp: Gen[Int] = Gen.oneOf(
    Gen.choose(0x20, 0x7e),        // 1-byte ascii
    Gen.choose(0xa1, 0x7ff),       // 2-byte latin/greek/cyrillic
    Gen.oneOf(Gen.choose(0x800, 0xd7ff),
      Gen.choose(0xe000, 0xffff)), // 3-byte BMP minus surrogates
    Gen.choose(0x10000, 0x10ffff)) // 4-byte supplementary (emoji etc.)

  private val str: Gen[String] = for {
    n <- Gen.choose(0, 64)
    cps <- Gen.listOfN(n, cp)
  } yield cps.foldLeft(new StringBuilder) {
    (b, c) => b.appendAll(Character.toChars(c))
  }.toString

  test("kernel equals the code-point reference on arbitrary unicode") {
    val prop = Prop.forAll(str) { s =>
      TrigramKernel.uniqueCount(UTF8String.fromString(s)) == reference(s)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("malformed UTF-8 (truncated multi-byte tails) never reads out of bounds") {
    // UTF8String contents are not guaranteed valid UTF-8 — e.g. binary
    // cast to string. A truncated sequence at the buffer end must
    // decode as a terminal code point, not throw AIOOBE and kill the
    // task. Exact counts are unspecified for malformed input; the
    // contract is "total and plausible".
    val truncated = Seq(
      Array(0xc3),                   // lone 2-byte lead
      Array(0xe2, 0x82),             // truncated 3-byte (€)
      Array(0xf0, 0x9f, 0x92),       // truncated 4-byte (emoji)
      Array(0x80, 0x81, 0x82, 0x83), // bare continuation bytes
      "abcd".getBytes("UTF-8").map(_ & 0xff).toSeq.toArray ++ Array(0xf4))
    truncated.foreach { raw =>
      val u = UTF8String.fromBytes(raw.map(_.toByte))
      val n = TrigramKernel.uniqueCount(u)
      assert(n >= 0L && n <= raw.length.toLong, s"count $n for ${raw.toSeq}")
    }
    // property: NO byte array, valid or not, throws
    val anyBytes = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    val prop = Prop.forAll(anyBytes) { bs =>
      TrigramKernel.uniqueCount(UTF8String.fromBytes(bs)) >= 0L
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel matches on pathological repeats and near-collisions") {
    // packing is 21 bits per code point: adjacent code points differing
    // only in high bits must not collide with shifted combinations
    val tricky = Seq(
      "",
      new String(Character.toChars(0x10ffff)) * 5,
      "a" * 1000,
      ("ab" * 500) + "c",
      new String(Character.toChars(0x10000)) + "ࠀ " * 3)
    tricky.foreach { s =>
      assert(TrigramKernel.uniqueCount(UTF8String.fromString(s)) ==
        reference(s), s"mismatch on ${s.take(20)}")
    }
  }
}
