package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiling main for STREAMING gates (not part of the driver
  * contract): runs named SparkEntry queries with a
  * StreamingQueryListener attached and prints each micro-batch's
  * durationMs breakdown (triggerExecution, queryPlanning, getBatch,
  * walCommit, addBatch, stateStore commit) — the per-trigger driver
  * machinery that job-level timing cannot see. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = if (args.nonEmpty) args.toSeq else Seq("q65_stream_session_append")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        lines.add(f"  START ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def g(k: String): Long = Option(dm.get(k)).map(_.toLong).getOrElse(-1L)
        lines.add(f"  BATCH ${p.batchId}%2d rows=${p.numInputRows}%7d " +
          f"trigger=${g("triggerExecution")}%5d addBatch=${g("addBatch")}%5d " +
          f"getBatch=${g("getBatch")}%4d latestOffset=${g("latestOffset")}%4d " +
          f"plan=${g("queryPlanning")}%4d wal=${g("walCommit")}%4d " +
          f"commit=${g("commitOffsets")}%4d " +
          p.stateOperators.map(so =>
            s"stateCommit=${so.allUpdatesTimeMs}+${so.commitTimeMs}ms " +
              s"rows=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
            .mkString(" "))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        lines.add("  END")
    })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    for (n <- names; r <- 1 to 2) {
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"QUERY $n%-28s r$r $wall%.2f s")
      Thread.sleep(500)
      if (r == 2) lines.forEach(l => println(l))
    }
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.stop()
  }
}
