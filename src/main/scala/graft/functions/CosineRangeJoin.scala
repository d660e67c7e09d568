package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All qualifying cosine pairs between two tiles of vectors, fused
  * into one expression: given tileA and tileB (arrays of
  * (id, vec, nrm) structs) emit every (a, b, cos) with
  * cos = dot(va, vb) / (na · nb) ≥ `minCos`, id-ordered (a < b).
  *
  * This is the inner kernel of the tiled exact cosine range join
  * ([[graft.ops.Similarity.cosineRangePairs]]): the O(|A|·|B|·dims)
  * pairwise work runs as a tight JIT'd loop over pre-extracted float
  * arrays — the same constant factors as a broadcast nested-loop
  * join — but only SURVIVING pairs materialize as rows, so the
  * surrounding plan is a small equi-join over tile pairs instead of a
  * cartesian product. `sameTile = true` restricts to the upper
  * triangle (k < l) so the diagonal tile doesn't emit mirrored or
  * self pairs; across distinct tiles every combination is evaluated
  * once and ordered by id on emission.
  *
  * Evaluated once per TILE PAIR (hundreds of rows, not millions), so
  * interpreted dispatch cost is irrelevant — CodegenFallback keeps it
  * simple while the hot loop stays primitive arithmetic.
  *
  * The dot accumulates in double, sequential 0..n-1, and divides by
  * the precomputed norms — bit-identical to
  * [[DotProduct]] / (na · nb), which the DuckDB oracle's
  * list_cosine_similarity matches at round-6 precision.
  */
case class CosineTilePairs(
    first: Expression, second: Expression, third: Expression,
    minCos: Double)
    extends TernaryExpression with CodegenFallback {

  private val tileType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("vec", ArrayType(FloatType)),
    StructField("nrm", DoubleType))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def tileOk(dt: DataType): Boolean = dt match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType, _), _, _),
        StructField(_, DoubleType, _, _))), _) => true
      case _ => false
    }
    if (tileOk(first.dataType) && tileOk(second.dataType) &&
        third.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_tile_pairs needs (array<struct<id:bigint,vec:array<float>," +
        s"nrm:double>>, same, boolean), got ${first.dataType.simpleString} / " +
        s"${second.dataType.simpleString} / ${third.dataType.simpleString}")
  }

  private def extract(tile: ArrayData)
      : (Array[Long], Array[Array[Float]], Array[Double]) = {
    val n = tile.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Float]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = tile.getStruct(i, 3)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1).toFloatArray()
      nrms(i) = row.getDouble(2)
      i += 1
    }
    (ids, vecs, nrms)
  }

  override def nullSafeEval(a: Any, b: Any, same: Any): Any = {
    val (idsA, vecsA, nrmsA) = extract(a.asInstanceOf[ArrayData])
    val (idsB, vecsB, nrmsB) = extract(b.asInstanceOf[ArrayData])
    val sameTile = same.asInstanceOf[Boolean]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < idsA.length) {
      val va = vecsA(i); val na = nrmsA(i); val ia = idsA(i)
      var j = if (sameTile) i + 1 else 0
      while (j < idsB.length) {
        val vb = vecsB(j)
        if (vb.length == va.length) {
          var dot = 0.0
          var k = 0
          while (k < va.length) { dot += va(k).toDouble * vb(k); k += 1 }
          val cos = dot / (na * nrmsB(j))
          if (cos >= minCos) {
            val ib = idsB(j)
            out += InternalRow(math.min(ia, ib), math.max(ia, ib), cos)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CosineTilePairs =
    copy(first = f, second = s, third = t)
}

object CosineRangeJoin {
  /** Column-level entry point for [[CosineTilePairs]]. `minCos` should
    * carry a small slack below the caller's threshold when the caller
    * re-filters on a rounded value. */
  def tilePairs(tileA: Column, tileB: Column, sameTile: Column,
      minCos: Double): Column =
    GraftColumnBridge.column(CosineTilePairs(
      GraftColumnBridge.expression(tileA), GraftColumnBridge.expression(tileB),
      GraftColumnBridge.expression(sameTile), minCos))
}
