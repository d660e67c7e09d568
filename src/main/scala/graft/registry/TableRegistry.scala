package graft.registry

import graft.types.{ColumnSpec, OracleTypeMapper, StandardizedTable}

/** Source-table discovery surface: the reference's
  * DatastreamTableRegistry/DatastreamTableAssessor re-expressed over a
  * pluggable catalog (production: JDBC metadata against Oracle; tests:
  * in-memory). */

case class TableId(database: String, schema: String, table: String)

case class TableDetail(
    id: TableId,
    columns: Seq[ColumnSpec],
    primaryKeys: Seq[String])

/** Where table metadata comes from. */
trait SourceCatalog {
  def listTables(): Seq[TableId]
  def describeTable(id: TableId): Option[TableDetail]
}

final class InMemoryCatalog(tables: Seq[TableDetail]) extends SourceCatalog {
  private val byId = tables.map(t => t.id -> t).toMap
  def listTables(): Seq[TableId] = tables.map(_.id)
  def describeTable(id: TableId): Option[TableDetail] = byId.get(id)
}

/** list / describe / standardize (DatastreamTableRegistry.java:82-186). */
class TableRegistry(catalog: SourceCatalog) {

  /** Oracle system schemas excluded from discovery
    * (DatastreamTableRegistry.java:70-71). */
  val SystemSchemas: Set[String] = Set("SYS", "SYSTEM", "CTXSYS", "XDB",
    "MDSYS", "FLOWS_FILES", "APEX_040000", "OUTLN")

  def listTables(): Seq[TableId] =
    catalog.listTables().filterNot(t => SystemSchemas.contains(t.schema))

  def describeTable(id: TableId): Option[TableDetail] =
    catalog.describeTable(id)

  /** Standardize: map types, drop unsupported columns, keep PK. */
  def standardize(detail: TableDetail): StandardizedTable =
    OracleTypeMapper.standardize(detail.id.database, detail.id.schema,
      detail.id.table, detail.columns, detail.primaryKeys)
}

/** Pre-flight assessment (DatastreamTableAssessor.java:180-380):
  * per-column support verdicts + table-level problems. */
class TableAssessor(registry: TableRegistry) {

  case class Problem(table: TableId, code: String, message: String)

  case class Assessment(
      tables: Seq[StandardizedTable],
      problems: Seq[Problem])

  def assess(ids: Seq[TableId]): Assessment = {
    val (found, missing) = ids.partition(registry.describeTable(_).isDefined)
    val standardized = found.flatMap(registry.describeTable).map(registry.standardize)
    val problems =
      missing.map(id => Problem(id, "TABLE_NOT_FOUND",
        s"table ${id.schema}.${id.table} not found in source")) ++
      standardized.filter(_.primaryKeys.isEmpty).map(t =>
        Problem(TableId(t.database, t.schema, t.table), "NO_PRIMARY_KEY",
          "merge requires a primary key; only append mode possible")) ++
      standardized.filter(_.sparkSchema.isEmpty).map(t =>
        Problem(TableId(t.database, t.schema, t.table), "NO_SUPPORTED_COLUMNS",
          "all columns are unsupported types"))
    Assessment(standardized, problems)
  }
}
