package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.load
import graft.util.Cols.dec4

/** Third wave: pivot, funnel analysis, approximate sketches, and a
  * salted skew-join (result-equivalent to the plain join — its oracle
  * IS the plain join's SQL). */
object Relational3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- pivot (wide conditional aggregation) ----
    "q28_pivot" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec4($"l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .withColumn("qty_f", coalesce($"qty_f", lit(0.0)))
        .withColumn("qty_o", coalesce($"qty_o", lit(0.0)))
        .orderBy($"l_returnflag")
    },

    // ---- funnel: view → click → purchase per user, strictly ordered ----
    "q29_funnel" -> { (s, d) =>
      import s.implicits._
      val e = graft.util.Tables.loadEvents(s, d)
        .select($"user_id", $"event_type", $"ts_us")
      val v = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("t1"))
      val c = e.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ts_us" > $"t1")
        .groupBy($"user_id").agg(min($"ts_us").as("t2"))
      val p = e.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ts_us" > $"t2")
        .groupBy($"user_id").agg(min($"ts_us").as("t3"))
      v.agg(count(lit(1)).as("n_view")).crossJoin(
        c.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after")))
    },

    // ---- observe(): pipeline-metrics instrumentation. A quality
    //      filter runs with named aggregates attached; the metrics
    //      come back through the observation side channel (no second
    //      scan — the production shape for row-count/accounting
    //      counters on a 100 TB pass) and are emitted as the result ----
    "q49_observe_metrics" -> { (s, d) =>
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation()
      val filtered = load(s, d, "lineitem")
        .filter($"l_quantity" >= 25)
        .observe(obs,
          count(lit(1)).as("n_kept"),
          sum(graft.util.Cols.dec4($"l_extendedprice")).cast("double")
            .as("kept_price"))
      filtered.write.format("noop").mode("overwrite").save()
      val row = obs.get
      Seq((row("n_kept").asInstanceOf[Long],
        row("kept_price").asInstanceOf[Double]))
        .toDF("n_kept", "kept_price")
    },

    // ---- approximate sketches: error-bound gate ----
    // sketch values are impl-defined (HLL++ register layout, KLL-style
    // percentile internals), so no DuckDB oracle can match them — but
    // the sketch CLAIM is its error bound, and that is oracle-able:
    // the query runs sketch AND exact reference in ONE aggregation
    // pass and emits per-group (exact_parts — real data, computed
    // independently by DuckDB — plus two deterministic bound flags):
    //  - hll_pass: |approx−exact|/exact ≤ 0.1 (default rsd 0.05; 2σ
    //    margin; deterministic — HLL is exact-replayable on fixed data)
    //  - median_pass: approx_percentile(accuracy=1000 → rank error
    //    ≤ n/1000) lands between the exact 49th and 51st percentiles
    //    (±1%·n rank margin, 10× the guarantee)
    // The exact legs are gate-reference work at gate scale (the
    // s-family brute-force pattern); production calls the sketch
    // aggregates alone. SketchSpec keeps the tighter spec-level bounds.
    "q30_approx_sketches" -> { (s, d) =>
      import s.implicits._
      // single-row-group input = one scan task; the per-row distinct
      // and sketch-insert work dominates, so spread it first (measured
      // 2.4 s -> 1.5 s at sf0.1)
      load(s, d, "lineitem")
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey").as("ap"),
          countDistinct($"l_partkey").as("exact_parts"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("am"),
          // one exact-percentile buffer, not two: the array form
          // computes both bracket ranks from a single value buffer
          expr("percentile(l_extendedprice, array(0.49, 0.51))").as("lohi"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"ap" - $"exact_parts") <=
            $"exact_parts".cast("double") * 0.1).cast("long").as("hll_pass"),
          ($"am" >= element_at($"lohi", 1) &&
            $"am" <= element_at($"lohi", 2)).cast("long").as("median_pass"))
        .orderBy($"l_returnflag")
    },

    // ---- salted skew join: result equals the plain join ----
    // BENCH NOTE: deliberately pessimized. At sf0.1 `part` is
    // broadcastable and the fastest plan is a broadcast join — but
    // this query exists to exercise the skew-salting path (explode
    // small side ×8, shuffle BOTH sides on the salted key), the tool
    // for skewed joins where neither side broadcasts. Read its bench
    // number as "cost of the salted shuffle join", not as a plan to
    // "fix" by broadcasting; the oracle being the plain join is the
    // correctness point.
    "q31_salted_join" -> { (s, d) =>
      import s.implicits._
      val li = load(s, d, "lineitem")
      val part = load(s, d, "part").select($"p_partkey", $"p_brand")
      graft.ops.Salting.saltedJoin(li, part, "l_partkey", "p_partkey",
          saltFrom = $"l_orderkey" * 8 + $"l_linenumber", n = 8)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          sum(dec4($"l_extendedprice")).cast("double").as("total"))
        .orderBy($"p_brand")
    }
  )

  val oracle: Map[String, String] = Map(
    // q30: error-bound gate (see the query) — exact_parts is real data
    // both engines compute; the flags assert the sketch bounds
    "q30_approx_sketches" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  CAST(1 AS BIGINT) AS hll_pass, CAST(1 AS BIGINT) AS median_pass
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_observe_metrics" ->
      """SELECT COUNT(*) AS n_kept,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS kept_price
        |FROM lineitem WHERE l_quantity >= 25""".stripMargin,

    "q28_pivot" ->
      """SELECT l_returnflag,
        |  COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS qty_f,
        |  COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q29_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS ts_us
        |           FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(ts_us) AS t2 FROM e
        |      JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(ts_us) AS t3 FROM e
        |      JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click_after,
        |       (SELECT COUNT(*) FROM p) AS n_purchase_after""".stripMargin,

    "q31_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
