package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-source local top-k between two tiles of vectors, fused into one
  * expression: given tileA and tileB (arrays of (id, vec, nrm)
  * structs) emit, for every a ∈ A, its best candidates b ∈ B by
  * cosine — the inner kernel of the exact kNN graph
  * ([[graft.ops.Similarity.knnGraph]]), sibling of
  * [[CosineTilePairs]]: the O(|A|·|B|·dims) work runs as a tight
  * JIT'd loop over pre-extracted primitive arrays, and only ~k rows
  * per source survive into the plan, so no row-per-pair relation ever
  * materializes.
  *
  * Emission rule: everything with raw cos ≥ (k-th best raw cos − ε),
  * ε = 2e−6. The caller ranks globally by (round(cos,6) desc, id) —
  * Spark's own `round` — and the ε slack guarantees no candidate that
  * could win under the ROUNDED ordering is locally excluded by a raw
  * comparison (two raw values within 1e−6 can round equal and then
  * tie-break by id). Self pairs (same id) are skipped. Fewer than k
  * candidates → all are emitted.
  *
  * Evaluated once per TILE PAIR (thousands of rows, not millions), so
  * interpreted dispatch is irrelevant — CodegenFallback keeps it
  * simple while the hot loop stays primitive arithmetic. Dot
  * accumulates in double, sequential 0..n−1, divided by precomputed
  * norms — bit-identical to [[DotProduct]]/(na·nb) and the DuckDB
  * oracle's list_cosine_similarity at round-6 precision.
  */
case class KnnTileTopK(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {

  private val Slack = 2e-6

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
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
    if (tileOk(left.dataType) && tileOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "knn_tile_topk needs two array<struct<id:bigint,vec:array<float>," +
        s"nrm:double>> tiles, got ${left.dataType.simpleString} / " +
        s"${right.dataType.simpleString}")
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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (idsA, vecsA, nrmsA) = extract(a.asInstanceOf[ArrayData])
    val (idsB, vecsB, nrmsB) = extract(b.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cosRow = new Array[Double](idsB.length)
    var i = 0
    while (i < idsA.length) {
      val va = vecsA(i); val na = nrmsA(i); val ia = idsA(i)
      var m = 0 // candidates scored for this source
      var j = 0
      while (j < idsB.length) {
        val vb = vecsB(j)
        if (idsB(j) != ia && vb.length == va.length) {
          var dot = 0.0
          var x = 0
          while (x < va.length) { dot += va(x).toDouble * vb(x); x += 1 }
          cosRow(j) = dot / (na * nrmsB(j))
          m += 1
        } else cosRow(j) = Double.NegativeInfinity
        j += 1
      }
      // k-th best raw cos (selection over the small tile row)
      val kth =
        if (m <= k) Double.NegativeInfinity
        else {
          val sorted = cosRow.clone().sortWith(_ > _)
          sorted(k - 1)
        }
      j = 0
      while (j < idsB.length) {
        if (cosRow(j) >= kth - Slack &&
            cosRow(j) != Double.NegativeInfinity)
          out += InternalRow(ia, idsB(j), cosRow(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KnnTileTopK = copy(left = l, right = r)
}

object KnnJoin {
  /** Column-level entry point for [[KnnTileTopK]]. */
  def tileTopK(tileA: Column, tileB: Column, k: Int): Column =
    GraftColumnBridge.column(KnnTileTopK(
      GraftColumnBridge.expression(tileA),
      GraftColumnBridge.expression(tileB), k))
}
