package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize

/** Streaming semantics beyond the CDC path: watermarked append-mode
  * windows and the custom stateful sessionizer. */
class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // offset from epoch: an event at exactly the initial watermark (0)
  // would be dropped as late data
  private val base = 1699999200000L // multiple of 30 min: aligned windows
  private def ts(min: Int): Timestamp = new Timestamp(base + min * 60000L)

  test("watermark + append mode emits only finalized windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("t", "value")
      .withWatermark("t", "10 minutes")
      .groupBy(window($"t", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("start"), $"n")
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((ts(1), 1.0), (ts(5), 1.0), (ts(31), 1.0))
      q.processAllAvailable() // watermark now 31-10=21min: nothing final
      assert(spark.table("wm_sink").count() == 0)
      input.addData((ts(55), 1.0)) // watermark 45min: [0,30) finalizes
      q.processAllAvailable()
      val rows = spark.table("wm_sink").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("n") == 2) // the two events in [0,30)
    } finally q.stop()
  }

  test("streaming exact dedup drops repeats within the watermark window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val dedup = graft.ops.Dedup.streamingExactDedup(
      input.toDF().toDF("k", "t"), Seq("k"), "t", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
      q.processAllAvailable()
      input.addData((1L, ts(4)), (2L, ts(5)), (3L, ts(6))) // 1,2 repeats
      q.processAllAvailable()
      val keys = spark.table("dedup_sink").select("k")
        .collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == Seq(1L, 2L, 3L)) // each key exactly once
    } finally q.stop()
  }

  test("watermark-bounded dedup EVICTS: state stays at the horizon " +
      "while plain dropDuplicates grows with every distinct key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    // 3 batches, each 20 keys, batch times 0 / 60 / 120 min with a
    // 10-minute delay: by batch 3 the watermark (110 min) has passed
    // batches 1-2 entirely
    def batch(b: Int): Seq[(Long, Timestamp)] =
      (0 until 20).map(i => (b * 100L + i, ts(b * 60)))

    val bounded = MemoryStream[(Long, Timestamp)]
    val bq = graft.ops.Dedup.streamingExactDedup(
        bounded.toDF().toDF("k", "t"), Seq("k"), "t", "10 minutes")
      .writeStream.format("memory").queryName("evict_bounded")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val plain = MemoryStream[(Long, Timestamp)]
    val pq = plain.toDF().toDF("k", "t").dropDuplicates("k")
      .writeStream.format("memory").queryName("evict_plain")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      (0 until 3).foreach { b =>
        bounded.addData(batch(b): _*); bq.processAllAvailable()
        plain.addData(batch(b): _*); pq.processAllAvailable()
      }
      // one extra empty-advance batch so eviction for the final
      // watermark is applied and reported
      bounded.addData((9999L, ts(200))); bq.processAllAvailable()
      plain.addData((9999L, ts(200))); pq.processAllAvailable()
      val boundedRows = stateRows(bq)
      val plainRows = stateRows(pq)
      // 61 distinct keys total: the unbounded form retains all of
      // them; the bounded form holds only keys the watermark hasn't
      // passed (at most the final batch + probe)
      assert(plainRows == 61L, s"plain state: $plainRows")
      assert(boundedRows <= 21L,
        s"bounded state did not evict: $boundedRows rows")
      // and both sinks saw every key exactly once (disjoint keys)
      assert(spark.table("evict_bounded").count() == 61L)
      assert(spark.table("evict_plain").count() == 61L)
    } finally { bq.stop(); pq.stop() }
  }

  test("session windows in watermark+append mode: closed sessions emit " +
      "exactly once, state holds only open sessions, drained output " +
      "equals the complete-mode result") {
    // q61's production claim made executable (q65 runs the same
    // discipline at corpus scale against the q61 oracle): complete
    // mode re-emits everything per batch and keeps every session in
    // state; watermark+append emits each closed session once and
    // evicts it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = input.toDF().toDF("user_id", "t", "value")
      .withWatermark("t", "10 minutes")
      .groupBy(session_window($"t", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"user_id", $"w.start".as("start"), $"w.end".as("end"),
        $"n", $"v")
    val q = agg.writeStream.format("memory").queryName("sess_append")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: three users open sessions; nothing closes (wm 0)
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0),
        (2L, ts(5), 3.0), (3L, ts(0), 4.0))
      q.processAllAvailable()
      assert(spark.table("sess_append").count() == 0)
      assert(stateRows(q) == 3, s"state: ${stateRows(q)}")
      // batch 2: user 3 EXTENDS its session across batches ([0,30) +
      // [20,50) merge); user 1 opens a later one, pushing the
      // watermark to 90 min — the three early sessions close and emit
      input.addData((3L, ts(20), 5.0), (1L, ts(100), 6.0))
      q.processAllAvailable()
      assert(spark.table("sess_append").count() == 3,
        spark.table("sess_append").collect().mkString(";"))
      assert(stateRows(q) == 1, s"state: ${stateRows(q)}") // [100,130) only
      // batch 3: wm 190 closes user 1's [100,130)
      input.addData((2L, ts(200), 7.0))
      q.processAllAvailable()
      assert(spark.table("sess_append").count() == 4)
      assert(stateRows(q) == 1, s"state: ${stateRows(q)}") // [200,230)
      // batch 4 (drain probe): wm 490 closes user 2's [200,230)
      input.addData((99L, ts(500), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_append")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .map { case (u, st, en, n, v) =>
          (u, (st.getTime - base) / 60000, (en.getTime - base) / 60000, n, v)
        }.toSeq
      // every closed session exactly once — complete mode over the
      // same feed would hold these 5 plus the probe's open session
      assert(rows.sorted == Seq(
        (1L, 0L, 40L, 2L, 3.0), (1L, 100L, 130L, 1L, 6.0),
        (2L, 5L, 35L, 1L, 3.0), (2L, 200L, 230L, 1L, 7.0),
        (3L, 0L, 50L, 2L, 9.0)).sorted, rows.sorted.mkString(";"))
      assert(stateRows(q) == 1, s"state: ${stateRows(q)}") // probe's own
    } finally q.stop()
  }

  test("kill-and-restart: a session stream restarted from its " +
      "checkpoint resumes mid-corpus — open sessions recover from " +
      "state, processed files never re-emit, drained output equals " +
      "the batch result exactly once") {
    // the reference's recoverable-restart taxonomy
    // (util/Utils.java:457-486) proved on the streaming side: q65/c16
    // gate the happy path; this leg kills the query partway through
    // the corpus (stop() aborts any in-flight batch) and restarts
    // from the checkpoint over an exactly-once file sink.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "chaos").toFile
    val stage = new java.io.File(root, "stage"); stage.mkdirs()
    val sink = new java.io.File(root, "sink").getPath
    val ckpt = new java.io.File(root, "ckpt").getPath

    // 8 time-ordered 60-min slices; users 1-30 sessionize fully before
    // the kill point, users 31-40 OPEN a session in slice 3 and extend
    // it in slice 4 — their state must survive the restart
    val events: Seq[(Long, Int)] =
      (1L to 30L).flatMap(u => Seq((u, u.toInt), (u, u.toInt + 20))) ++
        (31L to 40L).flatMap(u => Seq((u, 230), (u, 250)))
    def writeSlice(i: Int, rows: Seq[(Long, Int)]): Unit = {
      val tmp = new java.io.File(root, s"_tmp$i")
      rows.map { case (u, m) => (u, ts(m), 1.0) }.toDF("user_id", "t", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles.filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(stage, f"slice$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 3600_000L + i * 2000L)
      ()
    }
    val bySlice = events.groupBy(_._2 / 60)
    for (i <- 0 to 3) writeSlice(i, bySlice.getOrElse(i, Nil))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    // the deployment API under test: Sessionize.startAppendSessions
    // (watermark+append session windows into an exactly-once parquet
    // sink — the q65 discipline as an engine surface)
    def start() = Sessionize.startAppendSessions(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage.getPath),
      gap = java.time.Duration.ofMinutes(30),
      watermarkDelay = java.time.Duration.ofMinutes(1),
      sinkPath = sink, checkpointPath = ckpt)

    // run A: kill as soon as at least one batch committed (stop()
    // aborts whatever batch is in flight — wherever the kill lands,
    // the final output below must be identical)
    val qa = start()
    val deadline = System.currentTimeMillis() + 60000
    while (Option(qa.lastProgress).forall(_.batchId < 1) &&
        qa.isActive && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    qa.stop()

    // the rest of the corpus lands AFTER the crash, plus the two
    // far-future sentinel files that close the final sessions (the
    // q65 discipline: watermark advances at the end of the batch that
    // read sentinel 1, closed sessions emit in sentinel 2's batch)
    for (i <- 4 to 7) writeSlice(i, bySlice.getOrElse(i, Nil))
    writeSlice(8, Seq((-1L, 10000)))
    writeSlice(9, Seq((-1L, 11000)))

    // run B: restart from the same checkpoint, drain
    val qb = start()
    try qb.processAllAvailable() finally qb.stop()

    val got = spark.read.parquet(sink).filter($"user_id" >= 0)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    // batch/stream parity through the SAME API code path: the
    // expected relation is sessionWindows over the full corpus in
    // batch mode (withWatermark is a no-op there)
    val expected = Sessionize.sessionWindows(
        events.map { case (u, m) => (u, ts(m), 1.0) }
          .toDF("user_id", "t", "value"),
        gap = java.time.Duration.ofMinutes(30),
        watermarkDelay = java.time.Duration.ofMinutes(1))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    assert(got == expected,
      s"restart output diverged: got ${got.size} rows, " +
        s"expected ${expected.size}\n${got.mkString(";")}\nvs\n" +
        expected.mkString(";"))
    // the cross-restart sessions specifically: one 2-event session per
    // user 31-40, spanning the kill boundary
    assert((31L to 40L).forall(u =>
      got.count { case (uu, _, _, n, _) => uu == u && n == 2L } == 1),
      "a session spanning the restart was split or duplicated")
  }

  test("stream-static join buffers NO join state — only the downstream " +
      "aggregate holds rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "A"), (2L, "B")).toDF("k", "label")
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("k")
      .join(broadcast(dim), "k")
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(1L, 1L, 2L); q.processAllAvailable()
      input.addData(2L, 3L); q.processAllAvailable() // 3 has no dim row
      val out = spark.table("enrich_sink").orderBy("label")
        .as[(String, Long)].collect().toSeq
      assert(out == Seq(("A", 2L), ("B", 2L)))
      // exactly ONE state operator (the aggregate) and its rows equal
      // the group count — a stream-stream join would add a join
      // operator buffering both inputs
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 1, s"expected only the aggregate's state: " +
        ops.map(_.operatorName).mkString(","))
      assert(ops.head.numRowsTotal == 2L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes by gap and by timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "t", "value")
      .withWatermark("t", "1 minute")
    val sessions = Sessionize.sessions(df, java.time.Duration.ofMinutes(30))
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sess_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: two sessions split by a 40-min gap inside one batch
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 4.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sess_sink")
        .as[Sessionize.SessionOut].collect()
      assert(afterBatch1.length == 1) // first session closed by the gap
      assert(afterBatch1.head.n_events == 2 && afterBatch1.head.total_value == 3.0)

      // advance the watermark far past user 1's open session → timeout
      input.addData((2L, ts(200), 9.0))
      q.processAllAvailable()
      input.addData((2L, ts(300), 9.0)) // push watermark again
      q.processAllAvailable()
      val all = spark.table("sess_sink").as[Sessionize.SessionOut].collect()
      val u1 = all.filter(_.user_id == 1L).sortBy(_.start_us)
      assert(u1.length == 2)
      assert(u1(1).n_events == 1 && u1(1).total_value == 4.0)
    } finally q.stop()
  }

  test("transformWithState sessionizer (event-time timers) matches the " +
      "flatMapGroupsWithState contract: closes by gap and by watermark") {
    import spark.implicits._
    import graft.streaming.StateV2
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StateV2.sessions(
      input.toDS().withWatermark("_2", "1 minute"),
      java.time.Duration.ofMinutes(30))
    val q = sessions.toDF().writeStream.format("memory")
      .queryName("sessv2_sink").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // the exact scenario the flatMapGroupsWithState spec runs
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(50), 4.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sessv2_sink")
        .as[Sessionize.SessionOut].collect()
      assert(afterBatch1.length == 1) // first session closed by the gap
      assert(afterBatch1.head.n_events == 2 &&
        afterBatch1.head.total_value == 3.0)

      // advance the watermark far past user 1's open session → timer
      input.addData((2L, ts(200), 9.0))
      q.processAllAvailable()
      input.addData((2L, ts(300), 9.0)) // push watermark again
      q.processAllAvailable()
      val all = spark.table("sessv2_sink").as[Sessionize.SessionOut].collect()
      val u1 = all.filter(_.user_id == 1L).sortBy(_.start_us)
      assert(u1.length == 2, all.mkString(", "))
      assert(u1(1).n_events == 1 && u1(1).total_value == 4.0)
      // identical output contract to Sessionize.sessions on this feed
      assert(u1(0).start_us == ts(0).getTime * 1000L &&
        u1(0).end_us == ts(10).getTime * 1000L)
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("tied-timestamp events fold bit-exactly identically in both " +
      "sessionizers: the (timestamp, value) sort is the parity contract") {
    // three tied-timestamp values whose double-sum is order-sensitive:
    // (0.1+0.2)+0.3 = 0.6000000000000001 but (0.3+0.2)+0.1 = 0.6 — a
    // timestamp-only sort leaves the fold order to iterator whim and
    // the parity drifts by an ULP
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feed = Seq((1L, ts(0), 0.3), (1L, ts(0), 0.1), (1L, ts(0), 0.2),
      (1L, ts(50), 9.0)) // the gap closes the tied session in-batch
    def run(name: String,
        mk: org.apache.spark.sql.Dataset[(Long, Timestamp, Double)] =>
          org.apache.spark.sql.Dataset[Sessionize.SessionOut]): Double = {
      val input = MemoryStream[(Long, Timestamp, Double)]
      val q = mk(input.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        input.addData(feed: _*)
        q.processAllAvailable()
        val closed = spark.table(name).as[Sessionize.SessionOut].collect()
        assert(closed.length == 1 && closed.head.n_events == 3)
        closed.head.total_value
      } finally q.stop()
    }
    val v1 = run("tie_sess_v1", ds => Sessionize.sessions(
      ds.toDF("user_id", "t", "value").withWatermark("t", "1 minute"),
      java.time.Duration.ofMinutes(30)))
    // transformWithState requires the RocksDB provider (column families)
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val v2 =
      try run("tie_sess_v2", ds => graft.streaming.StateV2.sessions(
        ds.withWatermark("_2", "1 minute"), java.time.Duration.ofMinutes(30)))
      finally prevProv match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    assert(java.lang.Double.doubleToLongBits(v1) ==
      java.lang.Double.doubleToLongBits(v2),
      s"parity drift: $v1 vs $v2")
  }

  test("transformWithState running totals accumulate across batches; " +
      "max-seq row is the batching-independent final state") {
    import spark.implicits._
    import graft.streaming.StateV2
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Double)]
    val q = StateV2.runningTotals(input.toDS()).toDF().writeStream
      .format("memory").queryName("twstate_sink")
      .outputMode("append").start()
    try {
      input.addData((1L, 1.5), (2L, 2.0), (1L, 0.125))
      q.processAllAvailable()
      input.addData((1L, 0.25)) // second batch touches only user 1
      q.processAllAvailable()
      val rows = spark.table("twstate_sink")
        .as[StateV2.TotalsOut].collect()
      // user 1 saw two batches: seq rows 1 and 2, cumulative totals
      val u1 = rows.filter(_.user_id == 1L).sortBy(_.seq)
      assert(u1.map(_.seq).toSeq == Seq(1L, 2L))
      assert(u1.last.n_events == 3 && u1.last.total_value == 1.875)
      // user 2 saw one batch
      val u2 = rows.filter(_.user_id == 2L)
      assert(u2.map(_.seq).toSeq == Seq(1L))
      assert(u2.head.n_events == 1 && u2.head.total_value == 2.0)
      // the q56 reduction (max seq per key) equals a batch groupBy
      val finals = rows.groupBy(_.user_id).view
        .mapValues(_.maxBy(_.seq)).values.map(t =>
          (t.user_id, t.n_events, t.total_value)).toSet
      assert(finals == Set((1L, 3L, 1.875), (2L, 1L, 2.0)))
    } finally {
      q.stop()
      prevProv match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming LSH near-dup candidates are arrival-order-independent " +
      "and verify to the batch minhashPairs result") {
    import spark.implicits._
    import graft.ops.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 250)
      .select($"doc_id".cast("long").as("id"), $"text")
      .as[(Long, String)].collect().toSeq

    def candidates(batches: Seq[Seq[(Long, String)]],
        sink: String): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String)]
      val sig = input.toDF().toDF("id", "text")
        .filter(size(split($"text", " ")) >= 3)
        .select($"id", Dedup.hashedShingleSet($"text", 3).as("sh"))
        .select($"id",
          graft.functions.MinHash.signature($"sh", 64).as("sig"))
      val cand = Dedup.streamCandidatePairs(
        Dedup.bandBucketRows(sig, 64, 16))
      val q = cand.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(sink).dropDuplicates("a", "b")
        .as[(Long, Long)].collect().toSet
    }

    // three deliveries of the same corpus: one shot, three uneven
    // micro-batches, and ten interleaved slices
    val oneShot = candidates(Seq(docs), "d18spec_one")
    val three = candidates(Seq(docs.take(20), docs.slice(20, 180),
      docs.drop(180)), "d18spec_three")
    val ten = candidates(
      (0 until 10).map(i => docs.filter(_._1 % 10 == i)), "d18spec_ten")
    assert(oneShot.nonEmpty)
    assert(three == oneShot, "3-batch split changed the candidate set")
    assert(ten == oneShot, "10-way interleave changed the candidate set")

    // verified tail equals the batch operator on the same subset
    val subset = graft.util.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 250)
    val batchPairs = Dedup.minhashPairs(subset, "doc_id", "text", 0.8)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val base = subset.filter(size(split($"text", " ")) >= 3)
      .select($"doc_id".cast("long").as("id"), $"text")
    val verified = oneShot.toSeq.toDF("a", "b")
      .join(base.select($"id".as("a"), $"text".as("__ta")), "a")
      .join(base.select($"id".as("b"), $"text".as("__tb")), "b")
      .withColumn("sha", Dedup.hashedShingleSet($"__ta", 3))
      .withColumn("shb", Dedup.hashedShingleSet($"__tb", 3))
      .filter(Dedup.sizeCompatible($"sha", $"shb", 0.8))
      .withColumn("jaccard", Dedup.jaccard($"sha", $"shb"))
      .filter($"jaccard" >= 0.8)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(verified == batchPairs,
      "streaming-verified pairs diverge from batch minhashPairs")
  }
}
