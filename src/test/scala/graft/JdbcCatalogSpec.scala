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

  test("preflight drives its source-catalog leg through a live JDBC " +
      "source: failing Derby -> coded connectivity problem, healthy " +
      "Derby -> clean") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory(Paths.get("target"), "jdbc-pre")
    val admin = new graft.streaming.LocalDirSourceAdmin(
      root.resolve("admin").toString)
    val src = root.resolve("src"); Files.createDirectories(src)
    admin.create("s1", s"$src/*.avro")
    val target = root.resolve("table").toString

    // a database that does not exist and is not created — the
    // bad-URL/bad-credentials class of discovery failure
    val dead = new JdbcSourceCatalog(
      JdbcConnectionSpec("jdbc:derby:memory:preflight_absent",
        driver = Driver), "xe")
    val bad = PipelineValidator.preflight(admin, "s1", target, Some(dead))
    val problem = bad.connectivityIssues
      .find(_.code == "SOURCE_CATALOG_CONNECTIVITY")
    assert(problem.isDefined, bad.problems.mkString("; "))
    assert(problem.get.suggestion.contains("JDBC URL"))

    // the same leg against the live seeded source: clean report
    val live = new JdbcSourceCatalog(seeded, "xe")
    val good = PipelineValidator.preflight(admin, "s1", target, Some(live))
    assert(good.ok, good.problems.mkString("; "))
  }

  test("pool: a hung connect to one source does not block other callers") {
    JdbcClientPool.evictAll()
    SlowStubDriver.register()
    val warm = seeded // force Derby setup before the clock starts
    try {
      val slowDone = new java.util.concurrent.CountDownLatch(1)
      val slow = new Thread(() => {
        try JdbcClientPool.get(
          JdbcConnectionSpec("jdbc:graftslow:unreachable"))
        catch { case _: Throwable => () }
        finally slowDone.countDown()
      })
      slow.start()
      // let the slow thread enter its 5 s connect before we time ours
      Thread.sleep(200)
      val t0 = System.nanoTime()
      val c = JdbcClientPool.get(warm)
      val ms = (System.nanoTime() - t0) / 1e6
      // the ordering assertion is the real gate (wall-clock alone is
      // flaky on this co-tenant machine): our get returned while the
      // hung connect was STILL in flight. Under the pre-fix pool
      // (connect inside the pool lock) this caller waited out the
      // full hang, so the latch had already counted down.
      val stillConnecting = slowDone.getCount == 1
      assert(!c.isClosed)
      assert(stillConnecting || ms < 3000,
        f"discovery caller blocked $ms%.0f ms behind another source's " +
          "hung connect")
      assert(slowDone.await(15, java.util.concurrent.TimeUnit.SECONDS))
    } finally JdbcClientPool.evictAll()
  }

  test("pool: concurrent get for one spec keeps a single pooled " +
      "connection and closes the surplus") {
    JdbcClientPool.evictAll()
    try {
      val spec = memSpec("race")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val conns = (0 until 4).map(_ => pool.submit(
          new java.util.concurrent.Callable[java.sql.Connection] {
            def call(): java.sql.Connection = JdbcClientPool.get(spec)
          })).map(_.get(10, java.util.concurrent.TimeUnit.SECONDS))
        assert(JdbcClientPool.size == 1)
        // losers of the install race hand back the winner's pooled
        // connection (their surplus opens are closed internally), so
        // every caller holds the same live object
        val pooled = JdbcClientPool.get(spec)
        assert(!pooled.isClosed)
        assert(conns.forall(_ eq pooled))
      } finally pool.shutdown()
    } finally JdbcClientPool.evictAll()
  }

  // ---- Oracle-dialect discovery (round-11 verdict item 4) ----
  // Derby proves the JDBC mechanics; the vendor the reference actually
  // introspects reports metadata shapes Derby never produces. Each row
  // below is the exact (DATA_TYPE, TYPE_NAME, COLUMN_SIZE,
  // DECIMAL_DIGITS) tuple the Oracle JDBC driver returns from
  // getColumns for that DDL (public driver behavior: unconstrained
  // NUMBER as size 0 / scale -127, FLOAT(b) as a NUMBER with binary
  // precision and scale -127, vendor codes -101/-102/100/101/-103/
  // -104/-13 that predate java.sql.Types 2014), fed through the same
  // oracleTypeString → parse → lattice chain describeTable uses.
  test("recorded real-Oracle getColumns shapes standardize through " +
      "the §1.2b lattice") {
    import graft.types.{ColumnSpec, OracleTypeMapper, OracleDataType => O}
    val tz = OracleTypeMapper.timestampTzStruct
    // (ddl, dataType, typeName, size, scale, oracleType, sparkType)
    val recorded: Seq[(String, Int, String, Int, Int, O, Option[DataType])] =
      Seq(
        ("NUMBER", 2, "NUMBER", 0, -127, O.Number, Some(StringType)),
        ("NUMBER(5)", 2, "NUMBER", 5, 0, O.Number, Some(LongType)),
        ("NUMBER(10,2)", 2, "NUMBER", 10, 2, O.Number,
          Some(DecimalType(10, 2))),
        ("NUMBER(38)", 2, "NUMBER", 38, 0, O.Number, Some(StringType)),
        // FLOAT(126) backs onto NUMBER with binary precision,
        // scale -127: must come out Double, never the Long branch
        ("FLOAT(126)", 2, "NUMBER", 126, -127, O.Float, Some(DoubleType)),
        ("BINARY_FLOAT", 100, "BINARY_FLOAT", 4, 0, O.BinaryFloat,
          Some(FloatType)),
        ("BINARY_DOUBLE", 101, "BINARY_DOUBLE", 8, 0, O.BinaryDouble,
          Some(DoubleType)),
        // the driver reports DATE with the TIMESTAMP code (Oracle DATE
        // carries time of day)
        ("DATE", 93, "DATE", 7, 0, O.Timestamp, Some(TimestampType)),
        ("TIMESTAMP(6)", 93, "TIMESTAMP(6)", 11, 6, O.Timestamp,
          Some(TimestampType)),
        ("TIMESTAMP(6) WITH TIME ZONE", -101,
          "TIMESTAMP(6) WITH TIME ZONE", 13, 6,
          O.TimestampWithTimeZone, Some(tz)),
        // LOCAL tz normalizes to an instant — plain TIMESTAMP (the
        // reference's 33-type surface has no TSLTZ member)
        ("TIMESTAMP(6) WITH LOCAL TIME ZONE", -102,
          "TIMESTAMP(6) WITH LOCAL TIME ZONE", 11, 6,
          O.Timestamp, Some(TimestampType)),
        ("VARCHAR2(50)", 12, "VARCHAR2", 50, 0, O.Varchar2,
          Some(StringType)),
        ("ROWID", -8, "ROWID", 10, 0, O.Rowid, Some(StringType)),
        ("BFILE", -13, "BFILE", 0, 0, O.Bfile, Some(StringType)),
        ("RAW(16)", -3, "RAW", 16, 0, O.Raw, Some(BinaryType)),
        // LONG / LONG RAW are refused by the reference assessor —
        // mapping them to VARCHAR2/BLOB would silently "support" them
        ("LONG", -1, "LONG", 0, 0, O.Long, None),
        ("LONG RAW", -4, "LONG RAW", 0, 0, O.LongRaw, None),
        ("INTERVAL YEAR(2) TO MONTH", -103, "INTERVALYM", 2, 0,
          O.IntervalYearToMonth, None),
        ("INTERVAL DAY(2) TO SECOND(6)", -104, "INTERVALDS", 2, 6,
          O.IntervalDayToSecond, None))
    for ((ddl, dt, tn, size, scale, oType, sType) <- recorded) {
      val ts = JdbcSourceCatalog.oracleTypeString(dt, tn, size, scale)
      val a = OracleTypeMapper.evaluate(ColumnSpec("C", ts))
      assert(a.oracleType == oType,
        s"$ddl: rendered '$ts' parsed as ${a.oracleType}, want $oType")
      assert(a.sparkType == sType,
        s"$ddl: rendered '$ts' mapped to ${a.sparkType}, want $sType")
      assert(a.supported == sType.isDefined, s"$ddl supported flag")
      if (!a.supported) assert(a.suggestion.exists(_.contains(
        oType.sqlName)), s"$ddl: unsupported column must name its type")
    }
  }
}

/** A JDBC driver whose connect() hangs then fails — the unreachable-
  * source shape for the pool's no-cross-blocking contract. */
object SlowStubDriver extends java.sql.Driver {
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(this); registered = true
    }
  }
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftslow:")
  override def connect(url: String,
      info: java.util.Properties): java.sql.Connection =
    if (!acceptsURL(url)) null
    else {
      Thread.sleep(5000)
      throw new java.sql.SQLException("source unreachable", "08001")
    }
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties):
      Array[java.sql.DriverPropertyInfo] = Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
