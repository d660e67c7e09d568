package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Scalar (int8) quantization kernels — the third code-compression
  * shape next to PQ (subspace codebooks) and IVF (cell restriction):
  * each dimension maps independently to one byte on a per-dim
  * [min, max] grid, so a d-dim float vector stores as d bytes (4×)
  * with no codebook lookup at scan time. FAISS's SQ8.
  *
  * `params` is one float array of length 2d: mins[0..d-1] then
  * steps[0..d-1] (step = (max-min)/255; 0 for a constant dimension).
  * Both kernels are fused whole-stage-codegen loops over the raw
  * buffers (the CosineSimilarity discipline — a transform()/aggregate
  * HOF formulation is interpreted and allocates per row).
  *
  * Determinism: encode is Math.round on exact double arithmetic with
  * clamping (out-of-grid values saturate — queries/new vectors may
  * exceed the trained range); decode is min + code·step in double.
  * No RNG anywhere, so encode→score replays identically.
  */
case class SqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq_encode needs array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (p.numElements() != 2 * n) return null
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val step = p.getFloat(n + i).toDouble
      val c =
        if (step == 0.0) 0L
        else Math.round((v.getFloat(i).toDouble - p.getFloat(i).toDouble) / step)
      out(i) = Math.max(0L, Math.min(255L, c)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val step = ctx.freshName("step")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |if ($p.numElements() != 2 * $n) { ${ev.isNull} = true; }
         |else {
         |  byte[] $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $step = (double) $p.getFloat($n + $i);
         |    long $c = ($step == 0.0) ? 0L :
         |      Math.round(((double) $v.getFloat($i)
         |        - (double) $p.getFloat($i)) / $step);
         |    $out[$i] = (byte) Math.max(0L, Math.min(255L, $c));
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqEncode =
    copy(left = newLeft, right = newRight)
}

/** Approximate cosine between a float query and an SQ8-coded corpus
  * vector: one fused loop dequantizes each byte (min + code·step) and
  * accumulates dot and both norms — the scan side reads d BYTES per
  * corpus vector, never its floats. Null for length mismatches and
  * for zero-norm sides (no geometry). */
case class SqCosine(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && second.dataType == BinaryType && (third.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq_cosine needs (array<float>, binary, array<float>), got " +
        s"${first.dataType.simpleString} / ${second.dataType.simpleString}" +
        s" / ${third.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val p = c.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (codes.length != n || p.numElements() != 2 * n) return null
    var dot = 0.0; var nq = 0.0; var nv = 0.0
    var i = 0
    while (i < n) {
      val qi = q.getFloat(i).toDouble
      val vi = p.getFloat(i).toDouble +
        (codes(i) & 0xff).toDouble * p.getFloat(n + i).toDouble
      dot += qi * vi; nq += qi * qi; nv += vi * vi
      i += 1
    }
    if (nq == 0.0 || nv == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nq) * math.sqrt(nv)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes, p) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nq = ctx.freshName("nq")
      val nv = ctx.freshName("nv")
      val qi = ctx.freshName("qi"); val vi = ctx.freshName("vi")
      s"""
         |int $n = $q.numElements();
         |if ($codes.length != $n || $p.numElements() != 2 * $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nq = 0.0, $nv = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $qi = (double) $q.getFloat($i);
         |    double $vi = (double) $p.getFloat($i)
         |      + (double) ($codes[$i] & 0xff) * (double) $p.getFloat($n + $i);
         |    $dot += $qi * $vi; $nq += $qi * $qi; $nv += $vi * $vi;
         |  }
         |  if ($nq == 0.0 || $nv == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (Math.sqrt($nq) * Math.sqrt($nv)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqCosine =
    copy(first = f, second = s, third = t)
}

object ScalarQuantizer {
  def encode(vec: Column, params: Column): Column =
    GraftColumnBridge.column(SqEncode(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(params)))

  def cosine(qvec: Column, codes: Column, params: Column): Column =
    GraftColumnBridge.column(SqCosine(
      GraftColumnBridge.expression(qvec), GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(params)))
}
