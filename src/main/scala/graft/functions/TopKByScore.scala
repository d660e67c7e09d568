package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-score as a typed `Aggregator`: input (id, score),
  * output the k ids ranked by (score desc, id asc). The buffer never
  * holds more than ~4k entries — map-side partial aggregation trims
  * every partition's candidates down to k BEFORE the shuffle, so a
  * grouped top-k over a huge candidate relation (e.g. the ADC
  * candidates of an index-probe kNN-graph build: N·nprobe·cellsize
  * rows) exchanges ~k rows per group per map partition instead of the
  * whole relation. The window-function form (`row_number` over all
  * candidates) shuffles every candidate row; this is its
  * partial-aggregable replacement for top-k-per-key at scale.
  *
  * Deterministic: exact double comparison with id tiebreak — a total
  * order, so intermediate trims to any >= k prefix under the same
  * order never change the final top-k.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {

  private def ordered(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (s, id) => (-s, id) }

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (buf.length <= 4 * k) buf else ordered(buf).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
      v: (Long, Double)): Seq[(Double, Long)] =
    trim(buf :+ ((v._2, v._1)))

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    ordered(buf).take(k).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
