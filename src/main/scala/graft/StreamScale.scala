package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Stateful-streaming scale panel: runs the four streaming queries
  * (q41 dedup state, q45 stream-stream join state, q55 overlapping
  * window state, q56 transformWithState/RocksDB) at sf0.1 and at a
  * 100×-key-cardinality events replica, and records — via a
  * [[StreamingQueryListener]], so the queries themselves stay exactly
  * the production `SparkEntry.queries` closures — the state-store
  * metrics wall-clock alone can't show:
  *
  *  - `rows`: max total state rows across batches (Σ over operators)
  *  - `mem`: max state memory bytes
  *  - `commit`: max per-batch addBatch duration (the state commit
  *    path), plus the batch count
  *
  * The open 100 TB question this answers: does state SIZE scale with
  * key cardinality and does the per-batch commit stay bounded (flat
  * per-key cost), or does some state blow up super-linearly?
  *
  * Usage: runMain graft.StreamScale [bigDir] [queriesCsv]
  * (bigDir defaults to the round-8 100× events replica; regenerate
  * with `runMain graft.ScaleCheck target/scale100ev 100 events <q>`).
  */
object StreamScale {

  private val SrcDir = "/root/testdata/sf0.1"

  private final class StateMetrics extends StreamingQueryListener {
    @volatile var batches = 0
    @volatile var maxRows = 0L
    @volatile var maxMem = 0L
    @volatile var maxAddBatchMs = 0L
    @volatile var terminated = false

    def reset(): Unit = synchronized {
      batches = 0; maxRows = 0L; maxMem = 0L; maxAddBatchMs = 0L
      terminated = false
    }
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
      val p = e.progress
      batches += 1
      val rows = p.stateOperators.map(_.numRowsTotal).sum
      val mem = p.stateOperators.map(_.memoryUsedBytes).sum
      maxRows = math.max(maxRows, rows)
      maxMem = math.max(maxMem, mem)
      val ab = Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)
      maxAddBatchMs = math.max(maxAddBatchMs, ab)
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      synchronized { terminated = true }

    /** Listener events are ASYNC: wait for the terminated event so a
      * run's numbers are complete before reading them. */
    def await(maxMs: Long = 10000): Unit = {
      val deadline = System.currentTimeMillis() + maxMs
      while (!terminated && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    }
  }

  def main(args: Array[String]): Unit = {
    val bigDir = args.headOption.getOrElse("target/scale100ev")
    val queries = args.drop(1).headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q41_stream_dedup", "q45_stream_join",
        "q55_stream_sliding", "q56_stream_state_v2"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = new StateMetrics
    spark.streams.addListener(m)

    def run(name: String, dir: String): (Double, Int, Long, Long, Long) = {
      m.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      m.await()
      (wall, m.batches, m.maxRows, m.maxMem, m.maxAddBatchMs)
    }

    val out = queries.map { q =>
      val (bw, bb, br, bm, bc) = run(q, SrcDir)
      val (gw, gb, gr, gm, gc) = run(q, bigDir)
      println(f"STREAMSCALE $q%-22s sf0.1=$bw%6.2fs rows=$br%9d " +
        f"mem=${bm / 1024}%8dKiB commit=$bc%6dms | 100x=$gw%7.2fs " +
        f"rows=$gr%9d mem=${gm / 1024}%8dKiB commit=$gc%6dms " +
        f"wallx=${gw / bw}%5.2f rowsx=${if (br > 0) gr.toDouble / br else 0}%6.2f")
      (q, bw, bb, br, bm, bc, gw, gb, gr, gm, gc)
    }
    val js = out.map { case (q, bw, bb, br, bm, bc, gw, gb, gr, gm, gc) =>
      s""""$q":{"base":{"wall":${f"$bw%.2f"},"batches":$bb,"rows":$br,""" +
        s""""mem":$bm,"commit_ms":$bc},"big":{"wall":${f"$gw%.2f"},""" +
        s""""batches":$gb,"rows":$gr,"mem":$gm,"commit_ms":$gc}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_scale","queries":$js}""")
    spark.stop()
  }
}
