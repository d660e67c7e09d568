package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables.load

/** Fourth wave: scalar-function breadth (string, date, JSON, regex)
  * and null-ordering semantics — each DuckDB-oracled. */
object Relational4 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- string function breadth ----
    "q32_string_funcs" -> { (s, d) =>
      import s.implicits._
      load(s, d, "part")
        .select($"p_partkey",
          lpad($"p_brand", 12, "*").as("padded"),
          translate($"p_type", "aeiou", "AEIOU").as("translated"),
          regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
          reverse($"p_brand").as("reversed"),
          length(trim($"p_name")).cast("long").as("name_len"),
          replace($"p_type", lit(" "), lit("_")).as("snaked"))
        .orderBy($"p_partkey")
    },

    // ---- date/time function breadth ----
    "q33_date_funcs" -> { (s, d) =>
      import s.implicits._
      load(s, d, "orders")
        .select($"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("d"),
          date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus3m"),
          date_format(date_add($"o_orderdate".cast("date"), 45), "yyyy-MM-dd")
            .as("plus45d"),
          dayofweek($"o_orderdate").cast("long").as("dow"),
          quarter($"o_orderdate").cast("long").as("q"),
          date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("eom"))
        .orderBy($"o_orderkey")
    },

    // ---- JSON extraction from a string column ----
    "q34_json_extract" -> { (s, d) =>
      import s.implicits._
      load(s, d, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"k")
        .agg(count(lit(1)).as("n"))
        .orderBy($"k")
    },

    // ---- null ordering + null-safe equality ----
    "q35_null_semantics" -> { (s, d) =>
      import s.implicits._
      val o = load(s, d, "orders")
        .select($"o_orderkey",
          when($"o_orderstatus" === "P", $"o_totalprice").as("p_price"))
      o.select($"o_orderkey", $"p_price",
          ($"p_price" <=> lit(null)).as("is_null_safe"))
        .orderBy($"p_price".asc_nulls_last, $"o_orderkey")
        .limit(100)
    }
  )

  val oracle: Map[String, String] = Map(
    "q32_string_funcs" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS padded,
        |  translate(p_type, 'aeiou', 'AEIOU') AS translated,
        |  COALESCE(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
        |  reverse(p_brand) AS reversed,
        |  length(trim(p_name)) AS name_len,
        |  replace(p_type, ' ', '_') AS snaked
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q33_date_funcs" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(CAST(o_orderdate AS DATE) + 45, '%Y-%m-%d') AS plus45d,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q34_json_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_null_semantics" ->
      """SELECT o_orderkey, p_price, p_price IS NOT DISTINCT FROM NULL AS is_null_safe
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS p_price
        |      FROM orders) t
        |ORDER BY p_price ASC NULLS LAST, o_orderkey LIMIT 100""".stripMargin
  )
}
