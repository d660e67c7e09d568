package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k-by-frequency as a typed `Aggregator` — the engine's
  * user-facing UDAF surface (SURVEY §2.11). Buffers are per-partition
  * count maps merged associatively (map-side partial aggregation),
  * the finish step ranks deterministically by (count desc, value asc).
  *
  * Exact by design: the buffer holds every distinct value, which is
  * fine for categorical columns (the common case). For unbounded
  * domains, swap the buffer for a count-min/space-saving sketch behind
  * the same interface.
  */
case class TopKByCount(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf else buf.updated(v, buf.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (v, n)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + n)
    }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.toSeq.sortBy { case (v, n) => (-n, v) }.take(k)
      .map { case (v, n) => s"$v:$n" }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
