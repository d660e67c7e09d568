package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused product-quantization kernels.
  *
  * Why expressions and not `m × ksub` fused-dot columns over slices:
  * at m=16, ksub=32 that is 512 expression nodes per projection —
  * measured to blow janino's 64 KB method limit, silently dropping
  * the whole encode stage to interpreted execution (the exact failure
  * mode whole-stage codegen is supposed to avoid). Each kernel here
  * is ONE loop over the vector per row, O(dim × ksub) register
  * arithmetic, shuffle-free, constant-size plan.
  *
  * The codebook ([subspace][code][dim/m] flattened to one float[])
  * rides along as a reference object — codegen reads it via
  * `ctx.addReferenceObj`, so it is shipped once per task, not
  * re-parsed per row. Kernel bodies live in [[PqKernel]] (the
  * TrigramKernel lesson: scalac suppresses a companion's static
  * forwarder when the class inherits a same-named method, and the
  * generated call then janino-fails the stage into interpreted mode).
  *
  * Both kernels unit-normalize the input INSIDE the loop (so ADC
  * scores approximate cosine): a `transform(vec, x -> x/norm)`
  * pre-projection is an interpreted higher-order function that drags
  * the entire stage out of whole-stage codegen (PlanAuditSpec pins
  * this). Null input, length ≠ `m × ds`, or a zero vector → null
  * (same contract as the cosine kernel on degenerate input).
  */
case class PqCodes(child: Expression, codebook: Array[Float],
    m: Int, ksub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes needs array<float> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PqKernel.codes(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, arr => s"""
       |${ev.value} = graft.functions.PqKernel.codes($arr, $cbRef, $m, $ksub);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[s*ksub + c] = q_s · codebook(s)(c).
  * One row per query, so this is never hot — fused anyway so the
  * query path shares the encode stage's codegen shape. */
case class PqLut(child: Expression, codebook: Array[Float],
    m: Int, ksub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_lut needs array<float> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PqKernel.lut(input.asInstanceOf[ArrayData], codebook, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, arr => s"""
       |${ev.value} = graft.functions.PqKernel.lut($arr, $cbRef, $m, $ksub);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Static home for the PQ kernels so generated code can call them. */
object PqKernel {

  /** L2 norm, or 0 for a zero vector. */
  private def l2(vec: ArrayData, n: Int): Double = {
    var nrm2 = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble; nrm2 += x * x; i += 1
    }
    math.sqrt(nrm2)
  }

  /** Subspace codes of the UNIT-NORMALIZED input by L2-nearest
    * codebook entry; ties break to the lowest code (strict < scan
    * order). Normalization happens inside the loop — a `transform()`
    * projection would be a CodegenFallback HOF and drag the whole
    * encode stage out of codegen. Returns null on length mismatch or
    * a zero vector (its cosine is undefined). */
  def codes(vec: ArrayData, cb: Array[Float], m: Int, ksub: Int): ArrayData = {
    val ds = cb.length / (m * ksub)
    if (vec.numElements() != m * ds) return null
    val nrm = l2(vec, m * ds)
    if (nrm == 0.0) return null
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d2 = 0.0
        var i = 0
        val base = (s * ksub + c) * ds
        while (i < ds) {
          val d = vec.getFloat(s * ds + i).toDouble / nrm - cb(base + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Full m×ksub table of unit-normalized subvector dot products for
    * one query; null on length mismatch or a zero vector. */
  def lut(vec: ArrayData, cb: Array[Float], m: Int, ksub: Int): ArrayData = {
    val ds = cb.length / (m * ksub)
    if (vec.numElements() != m * ds) return null
    val nrm = l2(vec, m * ds)
    if (nrm == 0.0) return null
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var dot = 0.0
        var i = 0
        val base = (s * ksub + c) * ds
        while (i < ds) {
          dot += vec.getFloat(s * ds + i).toDouble / nrm * cb(base + i)
          i += 1
        }
        out(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

object ProductQuantizer {
  /** Column entry points. `codebook` is [s][c] → ds floats. */
  def codes(vec: Column, codebook: IndexedSeq[IndexedSeq[Seq[Float]]]): Column = {
    val (flat, m, ksub) = flatten(codebook)
    GraftColumnBridge.column(PqCodes(
      GraftColumnBridge.expression(vec), flat, m, ksub))
  }

  def lut(vec: Column, codebook: IndexedSeq[IndexedSeq[Seq[Float]]]): Column = {
    val (flat, m, ksub) = flatten(codebook)
    GraftColumnBridge.column(PqLut(
      GraftColumnBridge.expression(vec), flat, m, ksub))
  }

  private def flatten(cb: IndexedSeq[IndexedSeq[Seq[Float]]])
      : (Array[Float], Int, Int) =
    (cb.flatten.flatten.toArray, cb.length, cb(0).length)
}
