package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.registry._

/** JDBC-backed discovery over an EMBEDDED database (Derby, shipped in
  * the Spark runtime jars) — the live-catalog analog of the
  * reference's Datastream-introspects-Oracle path
  * (DatastreamTableRegistry.java:196-210) with its client pool
  * (util/Utils.java:112-125,969-981), testable without any Oracle:
  * Derby plays the source, the JDBC metadata surface is identical. */
class JdbcCatalogSpec extends AnyFunSuite {

  System.setProperty("derby.system.home", "target") // derby.log

  private val Driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
  private def memSpec(db: String) =
    JdbcConnectionSpec(s"jdbc:derby:memory:$db;create=true", driver = Driver)

  private lazy val seeded: JdbcConnectionSpec = {
    val spec = memSpec("catspec")
    val st = JdbcClientPool.get(spec).createStatement()
    try {
      st.execute("CREATE SCHEMA HR")
      st.execute("""CREATE TABLE HR.EMPLOYEES (
        EMPLOYEE_ID INT NOT NULL,
        NAME VARCHAR(50),
        SALARY DECIMAL(10,2),
        HIRED TIMESTAMP,
        PHOTO BLOB,
        BIG BIGINT,
        PRIMARY KEY (EMPLOYEE_ID))""")
      st.execute("""CREATE TABLE HR.ASSIGNMENTS (
        PROJECT VARCHAR(20) NOT NULL,
        EMPLOYEE_ID INT NOT NULL,
        ROLE VARCHAR(20),
        PRIMARY KEY (PROJECT, EMPLOYEE_ID))""")
      st.execute("CREATE TABLE HR.NOPK (A INT)")
    } finally st.close()
    spec
  }

  test("listTables walks schema.table at depth 2; describe pulls the " +
      "column level with PKs in KEY_SEQ order; standardize maps and " +
      "drops through the Oracle lattice") {
    val registry = new TableRegistry(new JdbcSourceCatalog(seeded, "xe"))

    val tables = registry.listTables()
    assert(tables.toSet == Set(
      TableId("xe", "HR", "EMPLOYEES"),
      TableId("xe", "HR", "ASSIGNMENTS"),
      TableId("xe", "HR", "NOPK")), tables)

    val emp = registry.describeTable(TableId("xe", "HR", "EMPLOYEES")).get
    assert(emp.primaryKeys == Seq("EMPLOYEE_ID"))
    // composite PK comes back in KEY_SEQ order, not alphabetical
    val asg = registry.describeTable(TableId("xe", "HR", "ASSIGNMENTS")).get
    assert(asg.primaryKeys == Seq("PROJECT", "EMPLOYEE_ID"))

    val std = registry.standardize(emp)
    assert(std.primaryKeys == Seq("EMPLOYEE_ID"))
    val byName = std.sparkSchema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("EMPLOYEE_ID") == IntegerType)
    assert(byName("NAME") == StringType)
    assert(byName("SALARY") == DecimalType(10, 2))
    assert(byName("HIRED") == TimestampType)
    // BIGINT normalizes to NUMBER(19,0): past the p<=18 long boundary,
    // so the lattice keeps it lossless as a string
    assert(byName("BIG") == StringType)
    // BLOB takes the unsupported-drop path, reported not thrown
    assert(!byName.contains("PHOTO"))
    assert(std.assessments.exists(a => a.name == "PHOTO" && !a.supported
      && a.suggestion.exists(_.contains("BLOB"))))

    // a MISSING table is not an error: None here, TABLE_NOT_FOUND in
    // the assessment — the TableNotFoundException analog
    assert(registry.describeTable(TableId("xe", "HR", "NOPE")).isEmpty)
    val a = new TableAssessor(registry).assess(Seq(
      TableId("xe", "HR", "EMPLOYEES"), TableId("xe", "HR", "NOPK"),
      TableId("xe", "HR", "NOPE")))
    assert(a.problems.exists(_.code == "TABLE_NOT_FOUND"))
    assert(a.problems.exists(_.code == "NO_PRIMARY_KEY"))
  }

  test("permanent source errors are fatal on the FIRST attempt — the " +
      "no-retries leg of DatastreamTableRegistryTest.java:75-155") {
    // a database that does not exist and is not created: Derby raises
    // a non-transient SQLException — the bad-credentials/bad-URL class
    val bad = new JdbcSourceCatalog(
      JdbcConnectionSpec("jdbc:derby:memory:absent", driver = Driver), "xe")
    var attempts = 0
    val e = intercept[graft.util.Retry.FatalPipelineException] {
      graft.util.Retry.withBackoff(
        graft.util.Retry.Policy(initialDelayMs = 1), _ => ()) {
        attempts += 1
        bad.listTables()
      }
    }
    assert(attempts == 1, s"permanent error was retried $attempts times")
    assert(e.getMessage.contains("permanent source failure"))
  }

  test("client pool: same spec -> same live connection; eviction at " +
      "capacity closes the eldest; LRU touch saves a hot entry; a dead " +
      "connection is replaced") {
    JdbcClientPool.evictAll()
    try {
      val specs = (0 until JdbcClientPool.PoolSize).map(i => memSpec(s"pool$i"))
      val conns = specs.map(JdbcClientPool.get)
      assert(JdbcClientPool.size == JdbcClientPool.PoolSize)
      // get-or-create: an equal spec (rebuilt, not the same instance)
      // returns the SAME live connection — the credentials-keyed reuse
      assert(JdbcClientPool.get(memSpec("pool0")) eq conns(0))

      // touch pool0 and pool1 (above), then overflow: the eldest is
      // now pool2 — access order, not insertion order, picks the victim
      JdbcClientPool.get(specs(1))
      JdbcClientPool.get(memSpec("pool20"))
      assert(JdbcClientPool.size == JdbcClientPool.PoolSize)
      assert(conns(2).isClosed, "evicted eldest must be CLOSED, not leaked")
      assert(!conns(0).isClosed && !conns(1).isClosed)
      // the evicted spec re-opens fresh on next use
      val reopened = JdbcClientPool.get(memSpec("pool2"))
      assert((reopened ne conns(2)) && !reopened.isClosed)

      // a pooled connection killed out from under us is replaced, not
      // handed back dead
      val c5 = JdbcClientPool.get(specs(5))
      c5.close()
      val c5b = JdbcClientPool.get(specs(5))
      assert((c5b ne c5) && !c5b.isClosed)
    } finally JdbcClientPool.evictAll()
  }
}
