package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.cdc.{Decode, TableAllowlist}

/** Typed pipeline configuration with upfront validation — the
  * engine's analog of the reference's 22-property DatastreamConfig +
  * validate() (DatastreamConfig.java): misconfiguration should fail
  * at submit time with every problem listed, not at the first
  * micro-batch. */
case class CdcConfig(
    sourceGlob: String,
    tablePath: String,
    checkpoint: String,
    primaryKeys: Seq[String],
    triggerSeconds: Int = 30,
    dmlBlacklist: Set[String] = Set.empty,
    columns: Seq[String] = Nil,
    numBuckets: Int = 16,
    maintenanceEvery: Int = 0,
    tableAllowlist: Seq[String] = Nil,
    modifiedAfter: Option[String] = None,
    maxFileAge: Option[String] = None,
    existingStreamId: Option[String] = None,
    processedLog: Option[String] = None) {

  private val ValidOps = Set("INSERT", "UPDATE", "DELETE")

  /** All configuration problems (empty = valid).
    *
    * Mirrors the reference-applicable subset of DatastreamConfig
    * validation (DatastreamConfig.java:348-396): mode-dependent
    * requirements (an existing stream id replaces the source location,
    * like usingExistingStream replaces host/user/password), path-shape
    * rules (the gcsPathPrefix normalization analog), and bounds on the
    * interacting knobs. */
  def validate(): Seq[String] = {
    val problems = Seq.newBuilder[String]
    // mode interaction: the source is EITHER a provisioned location or
    // an existing managed stream (resolved through SourceAdmin) — the
    // usingExistingStream ⊕ (host,user,password) rule
    existingStreamId match {
      case Some(id) if id.trim.isEmpty =>
        problems += "existingStreamId must not be blank when set"
      case None if sourceGlob.trim.isEmpty =>
        problems += "sourceGlob must not be empty (or set existingStreamId)"
      case _ => ()
    }
    if (tablePath.trim.isEmpty) problems += "tablePath must not be empty"
    if (checkpoint.trim.isEmpty) problems += "checkpoint must not be empty"
    if (checkpoint == tablePath)
      problems += "checkpoint must differ from tablePath"
    // nesting interaction: table maintenance (vacuum/sweepStaging)
    // deletes under tablePath; a checkpoint nested there could be
    // swept, and a table under the checkpoint confuses the file log
    def nested(inner: String, outer: String): Boolean =
      inner.nonEmpty && outer.nonEmpty &&
        (inner + "/").startsWith(outer.stripSuffix("/") + "/")
    if (nested(checkpoint, tablePath))
      problems += "checkpoint must not be nested under tablePath " +
        "(maintenance deletes under the table root)"
    if (nested(tablePath, checkpoint))
      problems += "tablePath must not be nested under checkpoint"
    // path shape: the write-side paths are literal directories; glob
    // metacharacters there mean a copy-pasted read glob — fail at
    // submit, not with an unreadable table later
    for ((v, n) <- Seq(tablePath -> "tablePath", checkpoint -> "checkpoint"))
      if (v.exists("*?[".contains(_)))
        problems += s"$n must be a literal path, not a glob: '$v'"
    if (primaryKeys.isEmpty)
      problems += "primaryKeys must not be empty (merge requires a key)"
    if (primaryKeys.distinct.size != primaryKeys.size)
      problems += "primaryKeys contains duplicates"
    if (triggerSeconds <= 0) problems += "triggerSeconds must be positive"
    if (triggerSeconds > 86400)
      problems += "triggerSeconds must be <= 86400 (one day): longer " +
        "cadences exceed any bounded-rescan SLA window"
    val badOps = dmlBlacklist -- ValidOps
    if (badOps.nonEmpty)
      problems += s"dmlBlacklist has unknown ops: ${badOps.mkString(", ")}"
    if (dmlBlacklist == ValidOps)
      problems += "dmlBlacklist excludes every operation"
    if (numBuckets <= 0) problems += "numBuckets must be positive"
    if (numBuckets > 65536)
      problems += "numBuckets must be <= 65536 (small-file pressure: " +
        "every micro-batch writes up to numBuckets files)"
    if (maintenanceEvery < 0) problems += "maintenanceEvery must be >= 0"
    if (columns.distinct.size != columns.size)
      problems += "columns projection contains duplicates"
    if (columns.nonEmpty && !primaryKeys.forall(columns.contains))
      problems += "columns projection must retain every primary key"
    problems ++= allowlist.validate()
    modifiedAfter.foreach { t =>
      if (scala.util.Try(java.sql.Timestamp.valueOf(t)).isFailure)
        problems += s"modifiedAfter '$t' is not a yyyy-mm-dd hh:mm:ss timestamp"
    }
    maxFileAge.foreach { a =>
      if (!a.matches("\\d+\\s*(ms|s|m|min|h|d)?"))
        problems += s"maxFileAge '$a' is not a duration (e.g. '3d', '12h')"
    }
    // the TTL log is maintenance state: sweeping under tablePath or the
    // checkpoint would let vacuum/file-log logic collide with it
    processedLog.foreach { log =>
      if (log.trim.isEmpty) problems += "processedLog must not be blank when set"
      else if (nested(log, tablePath) || nested(log, checkpoint))
        problems += "processedLog must not be nested under tablePath " +
          "or checkpoint"
    }
    problems.result()
  }

  def allowlist: TableAllowlist = TableAllowlist(tableAllowlist)
  def trigger: Trigger = Trigger.ProcessingTime(s"$triggerSeconds seconds")
  def decodeOptions: Decode.Options =
    Decode.Options(dmlBlacklist = dmlBlacklist, columns = columns,
      allowlist = allowlist)

  /** Validate-or-throw, with every problem in the message. */
  def validated(): CdcConfig = {
    val problems = validate()
    if (problems.nonEmpty) throw new IllegalArgumentException(
      s"invalid CdcConfig: ${problems.mkString("; ")}")
    this
  }
}
