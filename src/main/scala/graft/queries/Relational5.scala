package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TopKByCount
import graft.util.Tables.load
import graft.util.Cols.dec4

/** Fifth wave: the typed-Aggregator UDAF surface and window-frame
  * breadth (running totals, moving averages). */
object Relational5 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- custom typed Aggregator (UDAF): top-5 types per brand ----
    "q36_topk_udaf" -> { (s, d) =>
      import s.implicits._
      val topk = udaf(TopKByCount(5))
      load(s, d, "part")
        .groupBy($"p_brand")
        .agg(topk($"p_type").as("top_types"))
        .select($"p_brand", explode($"top_types").as("type_count"))
        .orderBy($"p_brand", $"type_count")
    },

    // ---- the SQL-string interface: identical text on both engines ----
    "q38_sql_interface" -> { (s, d) =>
      load(s, d, "orders").createOrReplaceTempView("orders")
      load(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(sharedSql)
    },

    // ---- correlated SCALAR subquery through the SQL analyzer ----
    // Catalyst decorrelates the COUNT subquery into an outer join +
    // aggregate; the capability trap is COUNT over an empty correlated
    // group, which must be 0, not NULL (sf0.1 contains a zero-order
    // customer that sits exactly on that edge)
    "q57_scalar_subquery" -> { (s, d) =>
      load(s, d, "customer").createOrReplaceTempView("customer")
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(scalarSubquerySql)
    },

    // ---- recursive CTE (month-spine fixed point + reporting join) ----
    "q59_recursive_cte" -> { (s, d) =>
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(recursiveSql("INTERVAL '1' MONTH", "date_format(m, 'yyyy-MM-dd')"))
    },

    // ---- distribution-ranking window family: ntile / percent_rank /
    //      cume_dist (q09/q37/q54 cover rank/row_number and frames) ----
    // percent_rank=(rank-1)/(n-1) and cume_dist=peers/n are ratios of
    // window-local INTEGERS, so the doubles are engine-exact; one sort
    // per nation partition serves all four functions.
    "q60_rank_functions" -> { (s, d) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      load(s, d, "customer")
        .filter($"c_nationkey" < 5)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy($"c_nationkey", $"c_acctbal", $"c_custkey")
    },

    // ---- GROUPING SETS via the shared-SQL path ----
    "q39_grouping_sets" -> { (s, d) =>
      load(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(groupingSetsSql)
    },

    // ---- small-order-quantity revenue (TPC-H Q17 shape):
    //      correlated per-part average via a derived aggregate ----
    "q40_small_qty_revenue" -> { (s, d) =>
      import s.implicits._
      val li = load(s, d, "lineitem")
      val part = load(s, d, "part").filter($"p_brand" === "Brand#1")
        .select($"p_partkey")
      val avgQty = li.groupBy($"l_partkey".as("pk"))
        .agg((sum(dec4($"l_quantity")).cast("double") / count(lit(1)))
          .as("avg_qty"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(avgQty, li("l_partkey") === avgQty("pk"))
        .filter($"l_quantity" < $"avg_qty" * 0.5)
        .agg((sum(dec4($"l_extendedprice")).cast("double") / 7.0)
          .as("avg_yearly"))
    },

    // ---- correlated LATERAL join (top-2 orders per customer) via the
    //      shared-SQL path: one SQL text, both engines. Catalyst
    //      rewrites the correlated limit into a ranked window join —
    //      no per-row rescan of orders ----
    "q50_lateral" -> { (s, d) =>
      load(s, d, "customer").createOrReplaceTempView("customer")
      load(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(lateralSql)
    },

    // ---- unpivot (wide → long), the inverse of q28's pivot ----
    "q47_unpivot" -> { (s, d) =>
      import s.implicits._
      load(s, d, "part")
        .select($"p_partkey", $"p_retailprice", $"p_size".cast("double"))
        .unpivot(Array($"p_partkey"),
          Array($"p_retailprice", $"p_size"), "metric", "v")
        .filter($"p_partkey" <= 100)
        .orderBy($"p_partkey", $"metric")
    },

    // ---- multiset set-ops: EXCEPT ALL / INTERSECT ALL keep
    //      duplicate multiplicity (q11/q26 cover the DISTINCT forms) ----
    "q48_multiset_ops" -> { (s, d) =>
      import s.implicits._
      val hi = load(s, d, "orders").filter($"o_totalprice" > 150000)
        .select($"o_orderpriority")
      val urgent = load(s, d, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_orderpriority")
      hi.exceptAll(urgent)
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_except"))
        .join(
          hi.intersectAll(urgent)
            .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_intersect")),
          Seq("o_orderpriority"), "full_outer")
        .select($"o_orderpriority",
          coalesce($"n_except", lit(0L)).as("n_except"),
          coalesce($"n_intersect", lit(0L)).as("n_intersect"))
        .orderBy($"o_orderpriority")
    },

    // ---- histogram binning via the width_bucket built-in ----
    // one linear scan + a 20-key hash aggregate (map-side partial);
    // the oracle replicates the Postgres bucket formula with the same
    // double arithmetic, since DuckDB has no width_bucket
    "q52_histogram" -> { (s, d) =>
      import s.implicits._
      load(s, d, "events")
        .select(width_bucket($"value", lit(0.0), lit(500.0), lit(20L))
          .as("bucket"), $"value")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum(dec4($"value")).cast("double").as("sum_v"))
        .orderBy($"bucket")
    },

    // ---- bivariate statistics: corr / covariance / regression ----
    // single-pass partial-aggregable moments per group; round-6 keeps
    // the engines' accumulation-order differences out of the hash.
    // The full regr_* family rides the same moments — slope/intercept/
    // r2/count/avgx/avgy are all ratios of the five sufficient
    // statistics (n, Σx, Σy, Σxx, Σxy), so the whole row is ONE
    // partial-aggregable pass however many are requested. The
    // unnormalized S-family (regr_sxx/sxy/syy) is excluded from the
    // oracle row: those are raw deviation sums (magnitude ~1e8 at this
    // SF), where round-6 would demand ~1e-15 relative agreement on
    // accumulation order — tighter than cross-engine float summation
    // guarantees; the normalized forms carry the same information.
    "q53_corr_stats" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 6)
            .as("covar_qp"),
          round(stddev_samp($"l_quantity"), 6).as("std_q"),
          round(regr_slope($"l_extendedprice", $"l_quantity"), 6)
            .as("slope_pq"),
          round(regr_intercept($"l_extendedprice", $"l_quantity"), 6)
            .as("icept_pq"),
          round(regr_r2($"l_extendedprice", $"l_quantity"), 6)
            .as("r2_pq"),
          regr_count($"l_extendedprice", $"l_quantity").as("nreg"),
          round(regr_avgx($"l_extendedprice", $"l_quantity"), 6)
            .as("avgx_q"),
          round(regr_avgy($"l_extendedprice", $"l_quantity"), 6)
            .as("avgy_p"))
        .orderBy($"l_returnflag")
    },

    // ---- value-based RANGE window frames (q37 covers ROWS frames):
    //      quantity shipped in the trailing 1000-price band, peers
    //      included per the SQL-standard RANGE semantics ----
    "q54_range_frames" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem").filter($"l_suppkey" <= 5)
        .selectExpr("l_suppkey", "l_orderkey", "l_linenumber",
          "l_extendedprice",
          "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER " +
            "(PARTITION BY l_suppkey ORDER BY l_extendedprice " +
            "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) " +
            "AS DOUBLE) AS qty_band")
        .orderBy($"l_suppkey", $"l_extendedprice", $"l_orderkey",
          $"l_linenumber")
    },

    // ---- window frames: running total + moving average ----
    "q37_window_frames" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      load(s, d, "lineitem")
        .filter($"l_suppkey" <= 10)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum(dec4($"l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_qty"),
          (sum(dec4($"l_extendedprice")).over(w.rowsBetween(-6, 0))
            .cast("double") /
            count(lit(1)).over(w.rowsBetween(-6, 0))).as("moving_avg7"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    }
  )

  val groupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
  COALESCE(l_linestatus, 'ALL') AS status,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY flag, status"""

  /** One SQL text, two engines: the same string runs through
    * spark.sql over temp views AND as its own DuckDB oracle. */
  val sharedSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val lateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
WHERE c.c_custkey <= 50
ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey"""

  /** Shared-SQL like q38: the identical text runs in both engines.
    * The correlated scalar COUNT must decorrelate to 0 (never NULL)
    * for customers with no orders. */
  val scalarSubquerySql: String =
    """SELECT c_custkey,
  (SELECT COUNT(*) FROM orders o
   WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE (SELECT COUNT(*) FROM orders o
       WHERE o.o_custkey = c.c_custkey) <= 2
ORDER BY c_custkey"""

  /** Recursive CTE (Spark 4's UnionLoop): an 81-row month spine built
    * by fixed-point iteration, then a broadcast equi-join of orders
    * against it. The spine is driver-side-tiny by construction
    * (recursion depth = months, bounded by the cteRecursionLevelLimit
    * of 100), so the only distributed work is one scan + one
    * broadcast-hash aggregate — the calendar never shuffles.
    * Spark and DuckDB differ in interval literal spelling and date
    * formatting (the string output keeps pandas date/timestamp
    * representations out of the compare; 81 post-aggregate rows, so
    * the formatter cost is nil). */
  private def recursiveSql(interval: String, fmt: String): String =
    s"""WITH RECURSIVE months(m) AS (
       |  SELECT DATE '1995-01-01'
       |  UNION ALL
       |  SELECT CAST(m + $interval AS DATE) FROM months
       |  WHERE m < DATE '2001-09-01')
       |SELECT $fmt AS month_start, COUNT(o_orderkey) AS n_orders
       |FROM months LEFT JOIN orders
       |  ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
       |GROUP BY m ORDER BY m""".stripMargin

  val oracle: Map[String, String] = Map(
    "q38_sql_interface" -> sharedSql,
    "q59_recursive_cte" -> recursiveSql("INTERVAL 1 MONTH", "strftime(m, '%Y-%m-%d')"),
    "q60_rank_functions" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin,
    "q57_scalar_subquery" -> scalarSubquerySql,
    "q50_lateral" -> lateralSql,
    "q40_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
        |  AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        |JOIN (SELECT l_partkey AS pk,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |          / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = pk
        |WHERE l_quantity < avg_qty * 0.5""".stripMargin,
    "q39_grouping_sets" -> groupingSetsSql,
    "q36_topk_udaf" ->
      """SELECT p_brand, p_type || ':' || CAST(n AS VARCHAR) AS type_count
        |FROM (
        |  SELECT p_brand, p_type, COUNT(*) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY COUNT(*) DESC, p_type) AS rn
        |  FROM part GROUP BY p_brand, p_type) t
        |WHERE rn <= 5 ORDER BY p_brand, type_count""".stripMargin,

    "q47_unpivot" ->
      """SELECT p_partkey, metric, v FROM (
        |  SELECT p_partkey, 'p_retailprice' AS metric,
        |    p_retailprice AS v FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part)
        |WHERE p_partkey <= 100
        |ORDER BY p_partkey, metric""".stripMargin,

    "q48_multiset_ops" ->
      """WITH hi AS (SELECT o_orderpriority FROM orders
        |            WHERE o_totalprice > 150000),
        |urgent AS (SELECT o_orderpriority FROM orders
        |           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |ex AS (SELECT o_orderpriority, COUNT(*) AS n_except
        |       FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM urgent)
        |       GROUP BY 1),
        |ix AS (SELECT o_orderpriority, COUNT(*) AS n_intersect
        |       FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM urgent)
        |       GROUP BY 1)
        |SELECT COALESCE(ex.o_orderpriority, ix.o_orderpriority)
        |    AS o_orderpriority,
        |  COALESCE(n_except, 0) AS n_except,
        |  COALESCE(n_intersect, 0) AS n_intersect
        |FROM ex FULL OUTER JOIN ix USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "q54_range_frames" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_extendedprice
        |     RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS qty_band
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_extendedprice, l_orderkey, l_linenumber"""
        .stripMargin,

    "q52_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN value < 0.0 THEN 0
        |              WHEN value >= 500.0 THEN 21
        |              ELSE CAST(floor((value - 0.0) / (500.0 - 0.0) * 20
        |                + 1) AS BIGINT) END AS bucket,
        |    value
        |  FROM events)
        |SELECT bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q53_corr_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
        |  round(stddev_samp(l_quantity), 6) AS std_q,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_pq,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6)
        |    AS icept_pq,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2_pq,
        |  regr_count(l_extendedprice, l_quantity) AS nreg,
        |  round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx_q,
        |  round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy_p
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q37_window_frames" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER
        |    (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER
        |    (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / COUNT(*) OVER
        |    (PARTITION BY l_suppkey
        |     ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_avg7
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
  )
}
