package graft.registry

import java.sql.{Connection, DriverManager, ResultSet, SQLException,
  SQLRecoverableException, SQLTransientException, Types}

import graft.types.ColumnSpec
import graft.util.Retry

/** One source connection's identity — the pool key. Plays the role the
  * credentials object plays for the reference's client pool
  * (util/Utils.java:969-981 keys the Datastream client pool by
  * GoogleCredentials): two catalogs built from equal specs share one
  * live connection.
  *
  * `driver` is an optional explicit JDBC driver class for environments
  * where the ServiceLoader auto-registration hasn't run. */
case class JdbcConnectionSpec(
    url: String,
    user: String = "",
    password: String = "",
    driver: Option[String] = None)

/** LRU pool of live JDBC connections, the engine analog of the
  * reference's Datastream client pool (util/Utils.java:112-125): a
  * bounded access-ordered map — capacity 20, load factor 0.75,
  * eldest-evicted past capacity — with double-checked get-or-create
  * (util/Utils.java:969-981). Two differences a JDBC resource forces:
  * an evicted connection is CLOSED (the reference lets dropped clients
  * be GC'd; an abandoned JDBC connection pins a server session), and a
  * pooled connection found dead is transparently replaced (control
  * planes multiplex internally; a JDBC session can be killed
  * server-side).
  *
  * Why a pool at all: discovery is driver-side control-plane work —
  * every `listTables`/`describeTable`/assessment leg would otherwise
  * open a fresh authenticated session, and a UI wired to discovery
  * hammers exactly that path. Bounded + LRU keeps at most 20 sessions
  * against the source regardless of how many distinct specs a
  * long-lived driver touches. */
object JdbcClientPool {

  val PoolSize = 20
  private val LoadFactor = 0.75f

  // Connections due for closing, staged under the pool lock and closed
  // OUTSIDE it under each connection's own monitor: a capacity-evicted
  // or stale-replaced connection can still be mid-drain in another
  // discovery caller (callers hold the connection monitor for the
  // duration of each metadata op — see JdbcSourceCatalog.classified),
  // and closing it out from under that caller would turn a pool
  // bookkeeping event into a spurious permanent-failure report.
  private val pendingClose = new java.util.ArrayList[Connection]()

  private val pool =
    new java.util.LinkedHashMap[JdbcConnectionSpec, Connection](
      (PoolSize / LoadFactor).toInt, LoadFactor, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[JdbcConnectionSpec, Connection])
          : Boolean = {
        val evict = size() > PoolSize
        if (evict) pendingClose.add(eldest.getValue)
        evict
      }
    }

  private def closeQuietly(c: Connection): Unit =
    try c.close() catch { case _: SQLException => () }

  /** Close everything staged for closing, outside the pool lock,
    * waiting out any in-flight user via the connection monitor. */
  private def drainPendingClose(): Unit = {
    val due = pool.synchronized {
      val copy = new java.util.ArrayList(pendingClose)
      pendingClose.clear()
      copy
    }
    due.forEach(c => c.synchronized(closeQuietly(c)))
  }

  /** The live connection for `spec` — cached, or opened and cached.
    *
    * The pool lock guards only map reads/writes. Both slow operations
    * — the `isValid` server ping and `DriverManager.getConnection` —
    * run OUTSIDE it, because a hung network connect to one source
    * would otherwise block every other discovery caller (the
    * reference's double-checked get-or-create discipline,
    * util/Utils.java:969-981, exists for the same reason). The price
    * is a benign race: two threads can open a connection for the same
    * spec concurrently; the double-check on re-insert keeps exactly
    * one and closes the loser, so the invariant — at most one POOLED
    * live connection per spec, stale entries closed not leaked — still
    * holds. */
  def get(spec: JdbcConnectionSpec): Connection = {
    val cached = pool.synchronized(pool.get(spec)) // access-order touch
    // isValid, not isClosed: a server-side-killed session still reads
    // isClosed=false on the client and would be handed out forever
    // (each use failing recoverable until the retry budget turns it
    // fatal); isValid pings the server — a control-plane round-trip,
    // cheap on the discovery paths this pool serves
    val valid = cached != null &&
      (try cached.isValid(/*timeoutSec=*/ 2)
       catch { case _: SQLException => false })
    if (valid) cached
    else {
      spec.driver.foreach(Class.forName)
      val fresh = DriverManager.getConnection(spec.url, spec.user,
        spec.password)
      val result = pool.synchronized {
        pool.get(spec) match {
          // another thread already installed a replacement while we
          // were connecting — it validated or opened its entry just
          // now, so trust it, and our connection is surplus (nobody
          // else can hold `fresh`, safe to close immediately)
          case raced if raced != null && (raced ne cached) =>
            closeQuietly(fresh)
            raced
          case raced =>
            // raced is either our known-dead `cached` or null: stage
            // the stale entry for closing (replacing without closing
            // leaks the client-side socket/session object; closing it
            // HERE could yank it from a caller mid-drain) and install
            // fresh
            if (raced != null) pendingClose.add(raced)
            pool.put(spec, fresh)
            fresh
        }
      }
      drainPendingClose()
      result
    }
  }

  def size: Int = pool.synchronized(pool.size())

  /** Close and drop every pooled connection (test hygiene / shutdown). */
  def evictAll(): Unit = {
    pool.synchronized {
      pool.values().forEach(c => pendingClose.add(c))
      pool.clear()
    }
    drainPendingClose()
  }
}

/** [[SourceCatalog]] over live JDBC metadata — the last reference seam:
  * where the reference discovers tables by asking Datastream to
  * introspect Oracle (DatastreamTableRegistry.java:196-210, one
  * DiscoverConnectionProfile call at hierarchy depth 2 for the
  * schema→table listing, one more level for a single table's columns),
  * this catalog asks the database itself through
  * `DatabaseMetaData` — `getTables` is the depth-2 listing,
  * `getColumns` + `getPrimaryKeys` the per-table level.
  *
  * Vendor JDBC types are normalized to the Oracle type-string lattice
  * the standardizer speaks ([[graft.types.OracleDataType]]), mirroring
  * the direction of the reference's convertStringDataTypeToSQLType
  * (util/Utils.java:136-209); a type with no counterpart falls through
  * as its raw name and takes the unsupported-column drop path.
  *
  * Failure taxonomy (DatastreamTableRegistryTest.java:75-155: permanent
  * errors surface once, with NO retry): `SQLTransientException` /
  * `SQLRecoverableException` map to [[Retry.RecoverableSourceException]]
  * so a `Retry.withBackoff` caller retries them; every other
  * `SQLException` (bad URL, auth failure, missing database) maps to
  * [[Retry.FatalPipelineException]] and propagates immediately. A
  * missing TABLE is not an error at all: `describeTable` returns None
  * and the assessor reports TABLE_NOT_FOUND, the analog of the
  * reference mapping InvalidArgument/FailedPrecondition to
  * TableNotFoundException.
  *
  * Scale note: discovery is bounded control-plane metadata (a table
  * list, one table's columns) on the driver — never data-plane work,
  * so nothing here grows with table CONTENTS. */
class JdbcSourceCatalog(spec: JdbcConnectionSpec, database: String)
    extends SourceCatalog {

  private def classified[T](what: String)(op: Connection => T): T =
    try {
      val conn = JdbcClientPool.get(spec)
      // JDBC Connections are not safe for concurrent multi-statement
      // use; same-source discovery serializes on the connection
      // monitor, and the pool's replacement/eviction paths close stale
      // connections under this same monitor — an in-flight drain can
      // never be closed out from under us. Different sources hold
      // different monitors and stay fully concurrent.
      conn.synchronized(op(conn))
    }
    catch {
      case e @ (_: SQLTransientException | _: SQLRecoverableException) =>
        throw new Retry.RecoverableSourceException(
          s"$what: transient source failure: ${e.getMessage}", e)
      case e: SQLException =>
        throw new Retry.FatalPipelineException(
          s"$what: permanent source failure " +
            s"(state=${e.getSQLState}): ${e.getMessage}", e)
    }

  private def drain[T](rs: ResultSet)(row: ResultSet => T): Seq[T] =
    try {
      val out = Seq.newBuilder[T]
      while (rs.next()) out += row(rs)
      out.result()
    } finally rs.close()

  override def listTables(): Seq[TableId] =
    classified("listTables") { conn =>
      drain(conn.getMetaData.getTables(null, null, "%",
        Array("TABLE"))) { rs =>
        TableId(database, rs.getString("TABLE_SCHEM"),
          rs.getString("TABLE_NAME"))
      }
    }

  override def describeTable(id: TableId): Option[TableDetail] =
    classified(s"describeTable ${id.schema}.${id.table}") { conn =>
      val md = conn.getMetaData
      val cols = drain(md.getColumns(null, id.schema, id.table, "%")) { rs =>
        ColumnSpec(
          rs.getString("COLUMN_NAME"),
          oracleTypeString(
            rs.getInt("DATA_TYPE"),
            rs.getString("TYPE_NAME"),
            rs.getInt("COLUMN_SIZE"),
            rs.getInt("DECIMAL_DIGITS")),
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
      }
      if (cols.isEmpty) None
      else {
        val pks = drain(md.getPrimaryKeys(null, id.schema, id.table)) { rs =>
          rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
        }.sortBy(_._1).map(_._2)
        Some(TableDetail(id, cols, pks))
      }
    }

  private def oracleTypeString(jdbcType: Int, typeName: String,
      size: Int, scale: Int): String =
    JdbcSourceCatalog.oracleTypeString(jdbcType, typeName, size, scale)
}

object JdbcSourceCatalog {

  // Oracle JDBC vendor type codes (oracle.jdbc.OracleTypes — public
  // constants the driver reports from getColumns long before the
  // java.sql.Types 2014 standard codes existed; the driver still
  // reports these by default)
  private val OracleTimestampTz = -101
  private val OracleTimestampLtz = -102
  private val OracleIntervalYm = -103
  private val OracleIntervalDs = -104
  private val OracleBinaryFloat = 100
  private val OracleBinaryDouble = 101
  private val OracleBfile = -13

  /** JDBC type → the Oracle type string the standardizer's lattice
    * parses. Kept total: unknown types pass through by name and are
    * dropped as unsupported downstream (with a per-column suggestion),
    * never thrown on.
    *
    * Real-Oracle metadata shapes (the vendor the reference actually
    * introspects, DatastreamTableRegistry.java:126-171) are handled
    * explicitly — these are exactly the rows oracle.jdbc reports from
    * `getColumns`:
    *
    *  - unconstrained NUMBER → DATA_TYPE=NUMERIC, COLUMN_SIZE=0,
    *    DECIMAL_DIGITS=-127 → "NUMBER" (no params: the lattice's
    *    lossless-string branch; the naive "NUMBER(0,-127)" rendering
    *    would fall into the p<=18 → Long branch and TRUNCATE)
    *  - FLOAT(b) → NUMERIC with DECIMAL_DIGITS=-127 and
    *    COLUMN_SIZE=b (binary precision) → "FLOAT(b)" → Double
    *  - TIMESTAMP(n) WITH [LOCAL] TIME ZONE → vendor codes -101/-102;
    *    LOCAL tz normalizes to an instant → plain TIMESTAMP, matching
    *    the reference's 33-type surface (no TSLTZ member)
    *  - BINARY_FLOAT/BINARY_DOUBLE → vendor codes 100/101
    *  - LONG / LONG RAW → LONGVARCHAR/LONGVARBINARY with those
    *    TYPE_NAMEs; kept as LONG/LONG_RAW so the registry drops them
    *    as unsupported exactly like the reference assessor (mapping
    *    them to VARCHAR2/BLOB would silently "support" columns the
    *    reference refuses)
    *  - ROWID (Types.ROWID), BFILE (-13), INTERVALYM/DS (-103/-104)
    */
  private[graft] def oracleTypeString(jdbcType: Int, typeName: String,
      size: Int, scale: Int): String = jdbcType match {
    case Types.SMALLINT | Types.TINYINT => "SMALLINT"
    case Types.INTEGER => "INTEGER"
    case Types.BIGINT => "NUMBER(19,0)"
    case Types.DECIMAL | Types.NUMERIC =>
      if (scale == -127)
        if (size == 0) "NUMBER" else s"FLOAT($size)"
      else s"NUMBER($size,$scale)"
    case Types.DOUBLE | Types.FLOAT => "DOUBLE PRECISION"
    case Types.REAL => "REAL"
    case Types.BOOLEAN | Types.BIT => "NUMBER(1,0)"
    case Types.VARCHAR => s"VARCHAR2($size)"
    case Types.LONGVARCHAR =>
      if (typeName.equalsIgnoreCase("LONG")) "LONG" else s"VARCHAR2($size)"
    case Types.NVARCHAR | Types.LONGNVARCHAR => s"NVARCHAR2($size)"
    case Types.CHAR => s"CHAR($size)"
    case Types.NCHAR => s"NCHAR($size)"
    case Types.DATE => "DATE"
    case Types.TIMESTAMP => "TIMESTAMP"
    case Types.TIMESTAMP_WITH_TIMEZONE | OracleTimestampTz =>
      "TIMESTAMP WITH TIME ZONE"
    case OracleTimestampLtz => "TIMESTAMP"
    case Types.CLOB => "CLOB"
    case Types.NCLOB => "NCLOB"
    case Types.LONGVARBINARY =>
      if (typeName.equalsIgnoreCase("LONG RAW")) "LONG_RAW" else "BLOB"
    case Types.BLOB => "BLOB"
    case Types.BINARY | Types.VARBINARY => s"RAW($size)"
    case Types.SQLXML => "XMLTYPE"
    case Types.ROWID => "ROWID"
    case OracleBinaryFloat => "BINARY_FLOAT"
    case OracleBinaryDouble => "BINARY_DOUBLE"
    case OracleBfile => "BFILE"
    case OracleIntervalYm => "INTERVAL YEAR TO MONTH"
    case OracleIntervalDs => "INTERVAL DAY TO SECOND"
    case _ => typeName
  }
}
