package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash slots of a pre-hashed shingle set in ONE
  * fused whole-stage-codegen loop: slot j = min over the set of
  * xxHash64(element, seed = j).
  *
  * Why an expression and not `array_min(transform(...))` × n or
  * `explode` + n `min()` aggregates: higher-order functions
  * (`transform`, `aggregate`) are interpreted (CodegenFallback), and
  * n-wide lambda trees make every action's Catalyst re-optimization
  * pass take longer than the job itself at small scale — while the
  * explode form pays a full shuffle of |corpus| × |shingles| rows.
  * This node is O(|shingles| × n) register arithmetic per row,
  * shuffle-free, with constant-size plans.
  *
  * Returns null for an empty/null input set (a document with no
  * shingles has no signature — callers drop such rows rather than
  * letting null slots collide in a shared band bucket).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs array<bigint> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    while (k < n) {
      val e = arr.getLong(k)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(e, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val e = ctx.freshName("e")
      val h = ctx.freshName("h"); val mins = ctx.freshName("mins")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $e = $arr.getLong($k);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashLong($e, (long) $j);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  /** Column-level entry point for [[MinHashSignature]]. */
  def signature(hashedShingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(
      GraftColumnBridge.expression(hashedShingles), numHashes))
}

/** The `bits`-bit SimHash of a pre-hashed token multiset in one fused
  * loop: bit j of the result is set iff the majority of token hashes
  * have bit j set (ties → 0, matching the sum(±1) > 0 vote). Same
  * rationale as [[MinHashSignature]]: per-bit vote columns are either
  * interpreted lambda trees or an explode + n aggregates shuffle;
  * this is one codegen'd pass over the array. Null for null input;
  * an empty multiset votes all bits to 0 (sig = 0). */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash_signature needs array<bigint> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var k = 0
    while (k < n) {
      val h = arr.getLong(k)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >>> j) & 1L) != 0L) 1 else -1)
        j += 1
      }
      k += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $votes = new int[$bits];
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $arr.getLong($k);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) != 0L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHash {
  /** Column-level entry point for [[SimHashSignature]]. */
  def signature(tokenHashes: Column, bits: Int = 32): Column =
    GraftColumnBridge.column(SimHashSignature(
      GraftColumnBridge.expression(tokenHashes), bits))
}
