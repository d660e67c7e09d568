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

/** Bounded top-k heap under the SAME total order as [[TopKByScore]]
  * ((score desc, id asc)); the imperative kernel behind
  * [[TopKBuckets.partialTopK]]. The head of the internal queue is the
  * WORST kept entry, so `add` is O(log k) and memory is exactly k
  * entries — never the candidate stream.
  *
  * Exists because Spark's `ObjectHashAggregateExec` (the exec node a
  * typed `Aggregator` plans to) falls back to SORT-BASED aggregation
  * after `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct keys per partition — and sort-based
  * aggregation sorts the whole INPUT stream. For a grouped top-k over
  * an N·nprobe·cellsize ADC candidate relation that means spilling
  * the candidates themselves (~10^11 rows at a 500 k corpus): the
  * exact failure the partial-aggregate design exists to prevent. The
  * hand-rolled partial below cannot fall back, whatever the group
  * count. */
final class BoundedTopK(k: Int) {
  // head = max under this ordering = the worst kept (lowest score,
  // then largest id)
  private val pq = scala.collection.mutable.PriorityQueue
    .empty[(Double, Long)](Ordering.by { case (s, id) => (-s, id) })

  def add(id: Long, score: Double): Unit = {
    if (pq.size < k) pq.enqueue((score, id))
    else {
      val (ws, wid) = pq.head
      if (score > ws || (score == ws && id < wid)) {
        pq.dequeue(); pq.enqueue((score, id))
      }
    }
  }

  /** Kept entries ordered (score desc, id asc). */
  def entries: Seq[(Double, Long)] =
    pq.toSeq.sortBy { case (s, id) => (-s, id) }
}

object TopKBuckets {

  /** Two-level grouped top-k over a candidate stream of
    * (key, id, score) rows — the scale-safe replacement for
    * `groupByKey(...).agg(TopKByScore(k))` when the number of groups
    * is unbounded (e.g. the corpus itself is the key set).
    *
    * Level 1 (`mapPartitions`): per-partition hash of [[BoundedTopK]]
    * heaps; when the hash exceeds `flushEvery` distinct keys it is
    * emitted and cleared (the total order makes any partial trim
    * safe), so task memory is O(flushEvery · k) regardless of key
    * cardinality — the structural guarantee ObjectHashAggregate's
    * fallback threshold only approximates. Level 2: shuffle the
    * ≤ partitions·k-per-key partial rows by key and merge with the
    * same heap. Output: (key, id, score) of each key's top k under
    * (score desc, id asc). Deterministic: the order is total, so
    * flush boundaries and partition layout cannot change the
    * result. */
  def partialTopK(ds: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int, flushEvery: Int = 1 << 14)
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import ds.sparkSession.implicits._
    val partial = ds.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap.empty[Long, BoundedTopK]
      var out = List.empty[Iterator[(Long, Long, Double)]]
      def drain(): Iterator[(Long, Long, Double)] = {
        val snapshot = heaps.toArray
        heaps.clear()
        snapshot.iterator.flatMap { case (key, h) =>
          h.entries.map { case (s, id) => (key, id, s) } }
      }
      it.foreach { case (key, id, s) =>
        heaps.getOrElseUpdate(key, new BoundedTopK(k)).add(id, s)
        if (heaps.size >= flushEvery) out ::= drain()
      }
      out.foldLeft(drain())(_ ++ _)
    }
    partial.groupByKey(_._1).flatMapGroups { (key, rows) =>
      val h = new BoundedTopK(k)
      rows.foreach { case (_, id, s) => h.add(id, s) }
      h.entries.map { case (s, id) => (key, id, s) }
    }
  }
}
