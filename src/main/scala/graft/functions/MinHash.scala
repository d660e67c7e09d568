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
