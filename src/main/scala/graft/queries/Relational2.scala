package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.load
import graft.util.Cols.dec4

/** Second relational wave (q21-q27): outer joins, CUBE + GROUPING,
  * exact percentiles, conditional aggregation, ordered array_agg,
  * UNION DISTINCT, and OFFSET pagination — each DuckDB-oracled.
  */
object Relational2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- left outer join with null-aware aggregation ----
    "q21_outer_join" -> { (s, d) =>
      import s.implicits._
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          sum(dec4($"o_totalprice")).cast("double").as("total"))
        .withColumn("total", coalesce($"total", lit(0.0)))
        .orderBy($"c_custkey")
    },

    // ---- CUBE with grouping markers ----
    "q22_cube" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping($"l_returnflag").cast("long").as("g_flag"),
          grouping($"l_linestatus").cast("long").as("g_status"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
          coalesce($"l_linestatus", lit("ALL")).as("status"),
          $"n", $"g_flag", $"g_status")
        .orderBy($"flag", $"status", $"g_flag", $"g_status")
    },

    // ---- exact percentiles (interpolating) per group ----
    // ---- exact percentiles, sort-based (graft.ops.Quantiles) ----
    // NOT expr("percentile(...)"): the built-in ships a per-group
    // value→count hash map through the shuffle — row-count-sized on
    // continuous doubles and heap-bound in one task per group. The
    // sort-based shape shuffles once on (flag, metric) and spills.
    "q23_percentiles" -> { (s, d) =>
      import s.implicits._
      graft.ops.Quantiles.quantileCont(load(s, d, "lineitem"),
          "l_returnflag", Seq(
            ("median_qty", "l_quantity", 0.5),
            ("p90_price", "l_extendedprice", 0.9)))
        .select($"l_returnflag",
          round($"median_qty", 4).as("median_qty"),
          round($"p90_price", 4).as("p90_price"))
        .orderBy($"l_returnflag")
    },

    // ---- conditional aggregation (pivot-style CASE sums) ----
    "q24_conditional_agg" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(when($"o_orderstatus" === "F", 1)).as("n_f"),
          count(when($"o_orderstatus" === "O", 1)).as("n_o"),
          count(when($"o_orderstatus" === "P", 1)).as("n_p"),
          sum(when($"o_totalprice" > 100000, dec4($"o_totalprice")))
            .cast("double").as("big_total"))
        .orderBy($"o_orderpriority")
    },

    // ---- ordered array aggregation ----
    // canonical comma-joined string output: the driver's pandas compare
    // sorts columns by value and cannot hash raw array cells
    "q25_array_agg" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(array_join(slice(sort_array(collect_list($"o_orderkey")), 1, 5), ",")
          .as("first_orders"))
        .orderBy($"o_custkey")
    },

    // ---- UNION DISTINCT across heterogeneous selects ----
    "q26_union_distinct" -> { (s, d) =>
      import s.implicits._
      val a = load(s, d, "customer").select($"c_nationkey".as("k"))
      val b = load(s, d, "supplier").select($"s_nationkey".as("k"))
      a.union(b).distinct().orderBy($"k")
    },

    // ---- OFFSET pagination over a total order ----
    "q27_pagination" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(100).limit(50)
    },

    // ---- distribution window functions: ntile / percent_rank / cume_dist ----
    "q44_window_stats" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      load(s, d, "orders")
        .select($"o_orderpriority", $"o_orderkey",
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    },

    // ---- FULL OUTER join with null-side markers ----
    "q42_full_outer" -> { (s, d) =>
      import s.implicits._
      val c = load(s, d, "customer")
        .groupBy($"c_nationkey".as("nk")).agg(count(lit(1)).as("n_cust"))
      val sup = load(s, d, "supplier")
        .filter($"s_nationkey" < 13) // make one side genuinely partial
        .groupBy($"s_nationkey".as("nk")).agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .select($"nk",
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"),
          ($"n_cust".isNull || $"n_supp".isNull).as("one_sided"))
        .orderBy($"nk")
    }
  )

  val oracle: Map[String, String] = Map(
    "q21_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q22_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY flag, status, g_flag, g_status""".stripMargin,

    "q23_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_conditional_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        |  CAST(SUM(CASE WHEN o_totalprice > 100000
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS big_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q25_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string((list_sort(list(o_orderkey)))[1:5], ',') AS first_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q26_union_distinct" ->
      """SELECT c_nationkey AS k FROM customer
        |UNION SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "q27_pagination" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,

    "q44_window_stats" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  round(PERCENT_RANK() OVER w, 6) AS pr,
        |  round(CUME_DIST() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q42_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |      FROM supplier WHERE s_nationkey < 13 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust,
        |  COALESCE(n_supp, 0) AS n_supp,
        |  (n_cust IS NULL OR n_supp IS NULL) AS one_sided
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin
  )
}
