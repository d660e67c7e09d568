package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT character trigrams of a string, in one pass.
  *
  * Value-identical (for length ≥ 3) to
  * `size(array_distinct(transform(sequence(1, length-2), i ->
  * substring(text, i, 3))))`, which allocates one string per position
  * and runs interpreted (transform is CodegenFallback): Spark's
  * `substring` addresses CODE POINTS, so the kernel walks the UTF-8
  * bytes once (no String decode), packs each code-point 3-gram into
  * one long (3 × 21 bits — exact, collision-free), sorts, and counts
  * uniques. The profile point: at 10× sf0.1 the declarative form is
  * the one text query that stays per-row-bound (ScaleCheck ratio 6.7);
  * the kernel is ~2.6× faster there and linear.
  *
  * Callers guard `length >= 3` (shorter inputs hit the declarative
  * fallback, whose sequence() edge semantics are not worth fusing).
  *
  * The kernel body lives in [[TrigramKernel]], NOT this companion:
  * scalac suppresses the companion's static `eval` forwarder because
  * the class inherits `Expression.eval(InternalRow)`, so generated
  * Java calling `UniqueTrigramCount.eval(utf8)` fails to janino-compile
  * and the whole stage silently falls back to interpreted execution.
  */
case class UniqueTrigramCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unique_trigram_count needs string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TrigramKernel.uniqueCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = graft.functions.TrigramKernel.uniqueCount($t);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UniqueTrigramCount =
    copy(child = newChild)
}

object UniqueTrigramCount {
  def apply(text: Column): Column =
    GraftColumnBridge.column(UniqueTrigramCount(
      GraftColumnBridge.expression(text)))
}

/** Shannon entropy (base 2) of a string's space-token distribution,
  * in one pass — the information-theoretic repetitiveness signal
  * (templated / machine-spun text scores low even when t10's
  * longest-run and d10's n-gram views look clean, because entropy sees
  * the WHOLE distribution, not the worst window).
  *
  * Tokenization is exactly `split(text, ' ')` with empty tokens
  * preserved (n = spaces + 1), matching both Spark's `split` and
  * DuckDB's `string_split` — the oracle tokenizes with the same
  * function, so token counts are integer-identical on both sides and
  * the only float work is the final `log2` arithmetic, written with
  * the same expression shape in the oracle.
  *
  * H = log2(n) − (Σ_token c·log2(c)) / n over per-token counts c.
  * Declaratively this is explode + two hash aggregates per doc —
  * a row-count×tokens-sized shuffle. The kernel keeps it per-row
  * (token run-length counting over an index sort of byte slices —
  * exact equality, no hashing, no collisions) inside whole-stage
  * codegen, so the corpus never shuffles for a per-doc score.
  * Same codegen packaging as [[UniqueTrigramCount]]; kernel body in
  * [[EntropyKernel]] for the janino-visible static call.
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_entropy needs string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    EntropyKernel.tokenEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = graft.functions.EntropyKernel.tokenEntropy($t);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropy {
  def apply(text: Column): Column =
    GraftColumnBridge.column(TokenEntropy(
      GraftColumnBridge.expression(text)))
}

/** Static home for the entropy kernel so generated code can call it. */
object EntropyKernel {

  /** Token split on the ASCII space byte — safe on arbitrary UTF-8
    * (0x20 never occurs inside a multi-byte sequence, continuation
    * bytes are ≥ 0x80) and total on malformed input (pure byte walk,
    * no decode). Token equality is exact byte equality; the index
    * sort gives adjacent runs, so counts need no hash table and no
    * hashing collisions exist by construction. */
  def tokenEntropy(text: UTF8String): Double = {
    val bytes = text.getBytes
    val nb = bytes.length
    var nTok = 1
    var i = 0
    while (i < nb) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    if (nTok == 1) return 0.0 // a single token is zero-entropy
    val starts = new Array[Int](nTok)
    val lens = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) {
        starts(t) = s; lens(t) = i - s; t += 1; s = i + 1
      }
      i += 1
    }
    starts(t) = s; lens(t) = nb - s
    // index sort by (length, bytes) — any total order works, runs of
    // EQUAL tokens are what's counted
    val idx = new Array[Integer](nTok)
    i = 0
    while (i < nTok) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(ai: Integer, bi: Integer): Int = {
        val a = ai.intValue(); val b = bi.intValue()
        if (lens(a) != lens(b)) return lens(a) - lens(b)
        var j = 0
        while (j < lens(a)) {
          val d = (bytes(starts(a) + j) & 0xff) - (bytes(starts(b) + j) & 0xff)
          if (d != 0) return d
          j += 1
        }
        0
      }
    })
    val ln2 = math.log(2.0)
    var sAcc = 0.0
    var run = 1
    i = 1
    while (i < nTok) {
      val a = idx(i).intValue(); val b = idx(i - 1).intValue()
      var same = lens(a) == lens(b)
      if (same) {
        var j = 0
        while (same && j < lens(a)) {
          if (bytes(starts(a) + j) != bytes(starts(b) + j)) same = false
          j += 1
        }
      }
      if (same) run += 1
      else {
        if (run > 1) sAcc += run * (math.log(run.toDouble) / ln2)
        run = 1
      }
      i += 1
    }
    if (run > 1) sAcc += run * (math.log(run.toDouble) / ln2)
    math.log(nTok.toDouble) / ln2 - sAcc / nTok
  }
}

/** Static home for the trigram kernel so generated code can call it. */
object TrigramKernel {

  /** Shared by interpreted eval and generated code. Walks the UTF-8
    * bytes directly — code-point units match `UTF8String.numChars`,
    * i.e. exactly the units Spark's `length`/`substring` address.
    *
    * UTF8String contents are NOT guaranteed valid UTF-8 (e.g. binary
    * cast to string), so every continuation-byte read is bounded by
    * the buffer: a truncated multi-byte sequence at the end decodes as
    * one terminal code point instead of reading past the array —
    * matching `UTF8String.numChars`' tolerance of malformed input.
    * `cps` is sized by the BYTE count (each loop step consumes ≥ 1
    * byte and emits exactly one code point), not `numChars()`, whose
    * malformed-input stepping differs from this walk.
    */
  def uniqueCount(text: UTF8String): Long = {
    val bytes = text.getBytes
    val nb = bytes.length
    val cps = new Array[Int](nb)
    var ci = 0
    var o = 0
    while (o < nb) {
      val b0 = bytes(o) & 0xff
      if (b0 < 0x80) {
        cps(ci) = b0; o += 1
      } else if (b0 < 0xe0) {
        if (o + 2 <= nb) {
          cps(ci) = ((b0 & 0x1f) << 6) | (bytes(o + 1) & 0x3f); o += 2
        } else { cps(ci) = b0; o = nb }
      } else if (b0 < 0xf0) {
        if (o + 3 <= nb) {
          cps(ci) = ((b0 & 0x0f) << 12) | ((bytes(o + 1) & 0x3f) << 6) |
            (bytes(o + 2) & 0x3f); o += 3
        } else { cps(ci) = b0; o = nb }
      } else {
        if (o + 4 <= nb) {
          cps(ci) = ((b0 & 0x07) << 18) | ((bytes(o + 1) & 0x3f) << 12) |
            ((bytes(o + 2) & 0x3f) << 6) | (bytes(o + 3) & 0x3f); o += 4
        } else { cps(ci) = b0; o = nb }
      }
      ci += 1
    }
    if (ci < 3) return math.min(ci.toLong, 1L) // callers guard; defensive
    val n = ci - 2
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      packed(i) = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) |
        cps(i + 2).toLong
      i += 1
    }
    java.util.Arrays.sort(packed)
    var uniq = 1L
    i = 1
    while (i < n) {
      if (packed(i) != packed(i - 1)) uniq += 1
      i += 1
    }
    uniq
  }
}

/** Ordered redaction pipeline fused into ONE pass per rule: apply the
  * rules in order, counting matches as they are replaced, and return
  * `struct(redacted: string, counts: array<long>)`.
  *
  * Value-identical to the declarative form — count i =
  * `regexp_count(redacted(text, rules.take(i)), pattern_i)` and
  * redacted = the full `regexp_replace` fold — but that form
  * re-evaluates the rule-prefix pipeline per count: O(rules²) regex
  * passes per row (each count re-replaces every earlier rule). The
  * kernel walks the pipeline once, so each rule costs exactly one
  * matcher pass, and count/replacement agreement is structural (one
  * matcher produces both) rather than re-derived.
  *
  * Same engine as Spark's own regexp functions (java.util.regex);
  * markers are literal (quoteReplacement), matching the contract that
  * rule tags never inject group references. Rules ride the expression
  * as data (serializable), compiled lazily per JVM.
  */
case class RedactWithCounts(child: Expression,
    rules: Seq[(String, String)]) extends UnaryExpression {

  import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"redact_with_counts needs string input, got ${other.simpleString}")
    }

  @transient private lazy val patterns: Array[java.util.regex.Pattern] =
    rules.map(r => java.util.regex.Pattern.compile(r._1)).toArray
  @transient private lazy val markers: Array[String] =
    rules.map(r => java.util.regex.Matcher.quoteReplacement(r._2)).toArray

  override def nullSafeEval(input: Any): Any =
    RedactKernel.redact(input.asInstanceOf[UTF8String], patterns, markers)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("redactPatterns", patterns,
      "java.util.regex.Pattern[]")
    val mks = ctx.addReferenceObj("redactMarkers", markers,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = graft.functions.RedactKernel.redact($t, $pats, $mks);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RedactWithCounts =
    copy(child = newChild)
}

object RedactWithCounts {
  def apply(text: Column, rules: Seq[(String, String)]): Column =
    GraftColumnBridge.column(RedactWithCounts(
      GraftColumnBridge.expression(text), rules))
}

object RedactKernel {
  def redact(text: UTF8String,
      patterns: Array[java.util.regex.Pattern],
      markers: Array[String]): org.apache.spark.sql.catalyst.InternalRow = {
    var s = text.toString
    val counts = new Array[Long](patterns.length)
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      var c = 0L
      val sb = new java.lang.StringBuffer
      while (m.find()) { c += 1; m.appendReplacement(sb, markers(i)) }
      counts(i) = c
      if (c > 0) { m.appendTail(sb); s = sb.toString }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(s),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(counts)))
  }
}
