package graft.cdc

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Replication include-list with the reference's wildcard semantics
  * (util/Utils.java:297-342 — an empty schema list means "*.*", a
  * schema with no tables means every table under it, else exactly the
  * listed tables):
  *
  *  - no patterns, or `*.*`  → replicate everything
  *  - `schema.*`             → every table under `schema`
  *  - `schema.table`         → exactly that table
  *  - `table` (no dot)       → that table under any schema
  *
  * Matching is case-insensitive (Oracle uppercases identifiers).
  */
case class TableAllowlist(patterns: Seq[String]) {

  private val parsed: Seq[(String, String)] = patterns.map { p =>
    p.split("\\.", 2) match {
      case Array(s, t) => (s.trim.toUpperCase, t.trim.toUpperCase)
      case Array(t) => ("*", t.trim.toUpperCase)
    }
  }

  /** Pattern-level problems (empty = valid). */
  def validate(): Seq[String] =
    parsed.zip(patterns).collect {
      case ((s, t), raw) if s.isEmpty || t.isEmpty =>
        s"allowlist pattern '$raw' has an empty schema or table segment"
    }

  def allowsAll: Boolean = patterns.isEmpty || parsed.contains(("*", "*"))

  def matches(schema: String, table: String): Boolean =
    allowsAll || parsed.exists { case (s, t) =>
      (s == "*" || s == schema.toUpperCase) &&
        (t == "*" || t == table.toUpperCase)
    }

  /** Row-level include filter over (schema, table) columns. */
  def filter(schemaCol: Column, tableCol: Column): Column =
    if (allowsAll) lit(true)
    else parsed.map { case (s, t) =>
      val sOk = if (s == "*") lit(true) else upper(schemaCol) === s
      val tOk = if (t == "*") lit(true) else upper(tableCol) === t
      sOk && tOk
    }.reduce(_ || _)

  /** File-level prune for layouts whose filenames lead with a
    * table-derived schema-key token (`<key>_…`, the token the decoder
    * parses per DatastreamEventReader.java:647-650): a filter over the
    * `path` column that admits only allowlisted tables' files, so
    * excluded tables are never avro-decoded.
    *
    * OPT-IN ONLY — callers must assert the layout by passing
    * `filenameKeyed = true` on the consuming side: deployments whose
    * filenames lead with something else (e.g. a stream id) would
    * otherwise silently prune EVERY file of an allowed table. The
    * row-level [[filter]] always applies regardless and is the
    * correctness backstop; this is purely a decode-cost optimization.
    * Only available when every pattern names a concrete table
    * (wildcard tables admit unknown keys). */
  def pathFilter(pathCol: Column): Option[Column] =
    if (allowsAll || parsed.exists(_._2 == "*")) None
    else Some(parsed.map { case (_, t) =>
      upper(pathCol).rlike("/" + Pattern.quote(t) + "_[^/]*$")
    }.reduce(_ || _))
}
