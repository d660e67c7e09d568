package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that keep the engine fast at
  * 100 TB, asserted so regressions fail CI rather than a cluster.
  *
  *  - filters/projections reach the parquet scan (PushedFilters /
  *    ReadSchema pruning)
  *  - small dimensions broadcast (no shuffle of the fact side)
  *  - top-k compiles to TakeOrderedAndProject (no global sort)
  *  - aggregations are partial (map-side combine before the shuffle)
  */
class PlanAuditSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter and projection push into the parquet scan") {
    val qe = SparkEntry.queries("q02_filter_project")(spark, sf).queryExecution
    val p = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // date-cast predicates are rewritten into pushable NTZ bounds
    assert(p.contains("LessThan(l_quantity,3.0)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(p.contains("l_shipdate") && !p.contains("l_returnflag"), p)
  }

  test("q05: all four dimension joins broadcast; fact side not shuffled for joins") {
    val p = plan("q05_regional_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q10: global top-k is TakeOrderedAndProject, not a full sort") {
    val p = plan("q10_topk_lineitems")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01: aggregation is partial before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("q07: semi join stays a join, not a filter-subquery rescan") {
    val p = plan("q07_exists_bigqty")
    assert(p.contains("LeftSemi"), p)
  }

  test("d04/d05/q43: no cartesian or nested-loop stage in the range joins") {
    for (q <- Seq("d04_blocked_jaccard", "d05_cosine_pairs", "q43_range_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("s12: exact kNN graph is tile equi-joins + kernel — no cartesian, " +
      "no row-per-pair window input") {
    val p = plan("s12_knn_graph")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the pairwise work lives in the fused kernel, not a join output
    assert(p.toLowerCase.contains("knntiletopk"), p.take(4000))
  }

  test("d17: boilerplate strip is equi-joins and hash aggregates only") {
    val p = plan("d17_strip_boilerplate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") || p.contains("HashJoin"), p)
  }

  test("q23: exact percentiles are sort-based — no value-map percentile " +
      "aggregate anywhere in the plan") {
    val p = plan("q23_percentiles")
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(p.contains("Window"), p) // the spillable ranking sort
  }

  test("t16: blocklist gate is expression-only — no join, no explode, " +
      "one aggregation exchange") {
    val p = plan("t16_blocklist")
    assert(!p.toLowerCase.contains("join"), p)
    assert(!p.contains("Generate"), p) // arrays_overlap, not explode
    assert("Exchange".r.findAllIn(p).size <= 2, p) // agg + final sort
  }

  test("d14: token-budget sampling is one window over one stratum " +
      "shuffle — no join, no self-scan") {
    val p = plan("d14_token_budget")
    assert(!p.toLowerCase.contains("join"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
    // one scan of documents only: the cumulative sum must not trigger
    // a second pass over the input
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("s08: PQ encode stays inside whole-stage codegen; shortlist re-rank " +
      "broadcasts") {
    val df = SparkEntry.queries("s08_pq_adc")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages print
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the fused PqCodes kernel must not fall out of codegen: the line
    // projecting pqcodes(...) carries a "*(n)" whole-stage-codegen mark
    val codesLine = p.linesIterator.find(_.contains("pqcodes"))
    assert(codesLine.exists(_.contains("*(")),
      s"pqcodes projection not inside a codegen stage:\n$p")
    // full corpus vectors are touched only via broadcast joins (the
    // Q-pass ADC scan and the shortlist re-rank) — no sort-merge join
    // anywhere: nothing shuffles the corpus by key
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t19: token entropy is one scanned pass — kernel in codegen, " +
      "no join, no aggregate shuffle") {
    val df = SparkEntry.queries("t19_token_entropy")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages print
    // the adaptive toString prints Final AND Initial plans — audit the
    // final one only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the per-doc score must NOT be the declarative explode+groupBy
    // shape: one parquet scan, no join, no hash aggregate — the only
    // exchange is the final orderBy's range partitioning
    assert(!p.toLowerCase.contains("join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    val entLine = p.linesIterator.find(_.toLowerCase.contains("tokenentropy"))
    assert(entLine.exists(_.contains("*(")),
      s"tokenentropy projection not inside a codegen stage:\n$p")
  }

  test("t20: redaction is one scanned pass — nested regexp stays in " +
      "codegen, no join, no aggregate") {
    val df = SparkEntry.queries("t20_redact")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // per-row transform only: one parquet scan; the sole exchange is
    // the output orderBy's range partitioning
    assert(!p.toLowerCase.contains("join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    // the fused kernel runs ONCE per row (struct staged, fields
    // extracted) inside a codegen stage — not one re-built rule-prefix
    // pipeline per count
    val redLine = p.linesIterator.find(_.contains("redactwithcounts"))
    assert(redLine.exists(_.contains("*(")),
      s"redaction kernel not inside a codegen stage:\n$p")
    assert("redactwithcounts".r.findAllIn(p).size == 1,
      s"kernel must evaluate once per row, not per extracted field:\n$p")
  }

  test("d19: index lookup never shuffles the indexed relations — " +
      "batch buckets and candidates broadcast, no sort-merge join") {
    val df = SparkEntry.queries("d19_index_dedup")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the 100 TB story: members/ and buckets/ stream through
    // broadcast-hash joins driven by the (small) batch side; a
    // SortMergeJoin would mean the stored index got shuffled per batch
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("p03: dataset card joins the median leg by broadcast — no " +
      "sort-merge join, aggregates partial") {
    val df = SparkEntry.queries("p03_dataset_card")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the stratum count is small by nature: the median relation must
    // broadcast, never shuffle the aggregate output by key
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the main rollup combines map-side before its exchange
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("s13: IVF+PQ probes are an equi-join on the cell id — codes " +
      "relation never cartesians, corpus never sort-merge shuffles") {
    val df = SparkEntry.queries("s13_ivf_pq")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    // the cid probe join and the re-rank join broadcast the tiny query
    // side; nothing shuffles the corpus by key
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the PQ encode stays fused (same contract as s08)
    val codesLine = p.linesIterator.find(_.contains("pqcodes"))
    assert(codesLine.exists(_.contains("*(")),
      s"pqcodes projection not inside a codegen stage:\n$p")
  }

  test("s04/s13: IVF cell assignment is map-side partial aggregation — " +
      "no assignment window, the exchange carries N rows, not N×nlist") {
    // the 100 TB contract: at production nlist ≈ √N the old
    // crossJoin+row_number shape shuffled the corpus×nlist expansion;
    // assignCells folds it map-side so one row per vector crosses the
    // wire. The only windows left are candidate-ranking (query-bounded).
    // (the brute-force recall reference is the session-shared
    // pre-materialized bruteForceRef since r15, so its rank Window no
    // longer appears in the gates' own plans — it scans ExistingRDD)
    def finalPlan(q: String): String = {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val p4 = finalPlan("s04_ann_ivf")
    assert(p4.contains("partial_min_by"), p4)       // corpus argmax leg
    assert(p4.contains("partial_collect_list"), p4) // query top-nprobe leg
    assert("Window \\[".r.findAllIn(p4).size == 1, p4) // ivf candidate rank
    val p13 = finalPlan("s13_ivf_pq")
    assert(p13.contains("partial_min_by"), p13)
    assert(p13.contains("partial_collect_list"), p13)
    assert("Window \\[".r.findAllIn(p13).size == 2, p13) // arank + rank
  }

  test("assignCells (shared by ivfTopK/ivfPqTopK/VectorIndex.writeCells/" +
      "search): assignment plan has no window and exactly one exchange, " +
      "after the partial aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("id", "vec")
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(-1f, 0f)))
      .toDF("cid", "cvec")
    for (n <- Seq(1, 2)) {
      val df = graft.ops.Similarity.assignCells(emb, "id", "vec", cents, n)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"n=$n:\n$p")
      assert(p.contains("partial_min_by") ||
        p.contains("partial_collect_list"), s"n=$n:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"n=$n:\n$p")
      // semantics unchanged from the window form: nearest cell, ties
      // to the smaller cid
      if (n == 1) {
        val got = df.select($"id", $"cid").as[(Long, Long)].collect().toMap
        assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L), got)
      }
    }
  }

  test("d13: boilerplate coverage has no pairwise stage — equi-joins and " +
      "hash aggregates only") {
    val p = plan("d13_boilerplate_cover")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the gram-frequency aggregate combines map-side before shuffling
    assert(p.contains("HashAggregate"), p)
  }

  test("d09: benchmark side broadcasts; corpus side joins without shuffle") {
    val p = plan("d09_decontam")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d15: the only pairwise stage is the within-cluster equi-join; " +
      "centroid assignment broadcasts, no cartesian") {
    val p = plan("d15_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
    // the k-centroid cross is a broadcast nested loop over k tiny rows
    // (intended); the N^2-risk stage — vector-vs-vector — must be an
    // equi-join keyed on the assigned cluster
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q59: the recursive month spine broadcasts; orders aggregate " +
      "partially before the shuffle") {
    val p = plan("q59_recursive_cte")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("s10: both retrieval channels are broadcast-side joins — " +
      "the corpus never feeds a cartesian") {
    val p = plan("s10_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q46: sliding windows are one generate + hash aggregate, no self-join") {
    val p = plan("q46_sliding_window")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("d10: repeated n-grams are join-free — explode + partial agg + top-k") {
    val p = plan("d10_repeated_ngrams")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("q52/q53: histogram and moment stats aggregate partially") {
    for (q <- Seq("q52_histogram", "q53_corr_stats")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q:\n$p")
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q:\n$p")
    }
  }

  test("p01: benchmark grams broadcast; the dedup pipeline executes once") {
    val p = plan("p01_train_pipeline")
    assert(p.contains("BroadcastHashJoin"), p)
    // the decontam stage must not anti-join deduped against a subset
    // of itself — that duplicates the scan→quality→window subtree.
    // Two Window nodes (dedup row_number + packing running sum), two
    // parquet scans (corpus + the separately-filtered benchmark side),
    // no more.
    assert("Window \\[".r.findAllIn(p).size <= 2, p)
    assert("Scan parquet".r.findAllIn(p).size <= 2, p)
  }

  test("runtime bloom filter reaches the fact side when the dim cannot broadcast") {
    // the 100 TB shape where the selective dimension is itself too big
    // to broadcast: Spark injects a bloom filter from the dim build
    // side into the fact scan, so the shuffle carries only plausible
    // rows. Thresholds are production-tuned (10 GB application side);
    // lowered here to exercise the mechanism at test scale.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.util.Tables.load(spark, sf, "lineitem")
      val part = graft.util.Tables.load(spark, sf, "part")
        .filter($"p_brand" === "Brand#1")
      val p = li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy($"p_type").count()
        .queryExecution.executedPlan.toString
      assert("bloom_filter".r.findAllIn(p.toLowerCase).size >= 2, p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the automatic complement of q31's deterministic salting: one hot
    // key owns 20% of the left side, AQE detects the oversized shuffle
    // partition after materialization and splits it. Thresholds are
    // production-scale by default; lowered to exercise the mechanism.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(300000).select(
        when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
        concat(lit("x"), $"id").as("payload"))
      val right = spark.range(5000).select($"id".as("k"), ($"id" * 2).as("v"))
      val j = left.join(right, "k")
      // collect drives THIS dataframe's own adaptive execution — a
      // sink write would finalize a different QueryExecution
      assert(j.collect().length == 152500)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("date-partitioned layout prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "partitioned").toString
    graft.util.Tables.loadEvents(spark, sf)
      .withColumn("day",
        date_format(timestamp_micros($"ts_us"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).filter($"day" === "2024-01-05")
    val scan = q.queryExecution.executedPlan.toString
    // partition filter present and the pruned count is tiny
    assert(scan.contains("PartitionFilters: [isnotnull(day"), scan)
    val parts = q.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).map(_.split("/day=")(1).split("/")(0)).distinct
    assert(parts.toSeq == Seq("2024-01-05"))
  }
}
