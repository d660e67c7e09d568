package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.util.Tables.load
import graft.util.Cols.{dec4, big4}

/** Relational operator surface: scan/filter/project, hash & broadcast
  * joins, semi/anti joins, aggregation, windows, sorts/top-k, set ops,
  * rollup, subquery-style plans. Each query has a DuckDB oracle in
  * `oracle` (same column names; decimal-exact arithmetic — see
  * [[graft.util.Cols]]).
  *
  * Scale notes (100 TB):
  *  - all scans are parquet with pushed filters / pruned columns;
  *  - small dims (region/nation/part/supplier/customer) are broadcast,
  *    the lineitem/orders side never shuffles for those joins;
  *  - aggregations are partial (map-side combine) by construction;
  *  - top-k uses TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  private val one4 = lit(1).cast(DecimalType(18, 4))

  /** l_extendedprice * (1 - l_discount) as exact DECIMAL(18,4). */
  private def discPrice(s: SparkSession) = {
    import s.implicits._
    (dec4($"l_extendedprice") * (one4 - dec4($"l_discount")))
      .cast(DecimalType(18, 4))
  }
  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation over a filtered scan (TPC-H Q1 shape) ----
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .filter($"l_shipdate".cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec4($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec4($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(discPrice(s)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", $"sum_qty".cast("double") / $"count_order")
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // ---- projection + filter pushdown (raw row passthrough) ----
    "q02_filter_project" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .filter(
          $"l_shipdate".cast("date") >= lit("1996-01-01").cast("date") &&
          $"l_shipdate".cast("date") < lit("1997-01-01").cast("date") &&
          $"l_quantity" < 3)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ---- global scalar aggregate (TPC-H Q6 shape) ----
    "q03_revenue" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .filter(
          $"l_shipdate".cast("date") >= lit("1996-01-01").cast("date") &&
          $"l_shipdate".cast("date") < lit("1997-01-01").cast("date") &&
          $"l_quantity" < 24)
        .agg(sum((dec4($"l_extendedprice") * dec4($"l_discount"))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
    },

    // ---- shuffle join + aggregation ----
    "q04_join_mktsegment" -> { (s, d) =>
      import s.implicits._
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec4($"o_totalprice")).cast("double").as("total"))
        .orderBy($"c_mktsegment")
    },

    // ---- 5-way join (TPC-H Q5 shape); dims broadcast ----
    "q05_regional_revenue" -> { (s, d) =>
      import s.implicits._
      val region = load(s, d, "region").filter($"r_name" === "ASIA")
      val nation = load(s, d, "nation")
      val cust = load(s, d, "customer")
      val sup = load(s, d, "supplier")
      val ord = load(s, d, "orders")
      val li = load(s, d, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(sup),
          li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy($"n_name")
        .agg(sum(discPrice(s)).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // ---- broadcast hash join on an explicit hint ----
    "q06_brand_volume" -> { (s, d) =>
      import s.implicits._
      val li = load(s, d, "lineitem")
      val part = load(s, d, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy($"p_brand")
        .agg(sum(dec4($"l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },

    // ---- left-semi join (EXISTS) ----
    "q07_exists_bigqty" -> { (s, d) =>
      import s.implicits._
      val o = load(s, d, "orders")
      val li = load(s, d, "lineitem").filter($"l_quantity" >= 48)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // ---- left-anti join (NOT EXISTS) ----
    "q08_customers_no_urgent" -> { (s, d) =>
      import s.implicits._
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // ---- ranking window function, top-N per group ----
    "q09_top_orders_per_cust" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      load(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    // ---- global top-k (TakeOrderedAndProject, no full sort) ----
    "q10_topk_lineitems" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    // ---- set operations ----
    "q11_setops_nations" -> { (s, d) =>
      import s.implicits._
      val cn = load(s, d, "customer").select($"c_nationkey".as("k"))
      val sn = load(s, d, "supplier").select($"s_nationkey".as("k"))
      val both = cn.intersect(sn).withColumn("tag", lit("both"))
      val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
      both.unionByName(custOnly).select($"tag", $"k").orderBy($"tag", $"k")
    },

    // ---- distinct aggregation ----
    "q12_distinct_parts" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // ---- HAVING (post-aggregation filter) ----
    "q13_big_customers" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec4($"o_totalprice")).cast("double").as("total"))
        .filter($"n_orders" >= 12)
        .orderBy($"o_custkey")
    },

    // ---- scalar functions: CASE, string, date ----
    "q14_scalar_funcs" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .select(
          $"o_orderkey",
          expr("substring(o_orderpriority, 3)").as("prio_name"),
          when($"o_totalprice" > 200000, "big")
            .when($"o_totalprice" > 50000, "mid")
            .otherwise("small").as("bucket"),
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          concat($"o_orderstatus", lit("/"), $"o_orderpriority").as("tag"))
        .orderBy($"o_orderkey")
    },

    // ---- join against a derived aggregate (subquery shape) ----
    "q15_above_brand_avg" -> { (s, d) =>
      import s.implicits._
      val p = load(s, d, "part")
      val avgByBrand = p.groupBy($"p_brand".as("b"))
        .agg((sum(dec4($"p_retailprice")).cast("double") /
          count(lit(1))).as("avg_price"))
      p.join(broadcast(avgByBrand), p("p_brand") === avgByBrand("b"))
        .filter($"p_retailprice" > $"avg_price" * 1.02)
        .select($"p_partkey", $"p_brand", $"p_retailprice")
        .orderBy($"p_partkey")
    },

    // ---- ROLLUP (hierarchical aggregation) ----
    "q16_rollup" -> { (s, d) =>
      import s.implicits._
      load(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum(dec4($"l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
          coalesce($"l_linestatus", lit("ALL")).as("status"),
          $"sum_qty", $"n")
        .orderBy($"flag", $"status")
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_quantity < 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_revenue" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_quantity < 24""".stripMargin,

    "q04_join_mktsegment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q05_regional_revenue" ->
      s"""SELECT n_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_brand_volume" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q07_exists_bigqty" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,

    "q08_customers_no_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q09_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q10_topk_lineitems" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q11_setops_nations" ->
      """SELECT 'both' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer
        |   INTERSECT SELECT s_nationkey FROM supplier) a
        |UNION ALL
        |SELECT 'cust_only' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer
        |   EXCEPT SELECT s_nationkey FROM supplier) b
        |ORDER BY tag, k""".stripMargin,

    "q12_distinct_parts" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q13_big_customers" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q14_scalar_funcs" ->
      """SELECT o_orderkey,
        |  substring(o_orderpriority, 3) AS prio_name,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 50000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  o_orderstatus || '/' || o_orderpriority AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q15_above_brand_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part JOIN (
        |  SELECT p_brand AS b,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM part GROUP BY p_brand) a ON p_brand = b
        |WHERE p_retailprice > avg_price * 1.02
        |ORDER BY p_partkey""".stripMargin,

    "q16_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin
  )
}
