package graft.util

/** Failure taxonomy + retry policy for source/control-plane calls,
  * mirroring the reference's semantics (util/Utils.java:457-486,
  * 901-925): transient faults retry with exponential backoff under a
  * wall-clock budget; permanent faults (bad config, missing objects,
  * permission problems) abort immediately and fail the pipeline.
  */
object Retry {

  /** Transient: the pipeline should retry/restart (reference:
    * DatastreamDeltaSourceException). */
  class RecoverableSourceException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** Permanent: fail the pipeline (reference: DeltaFailureException). */
  class FatalPipelineException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** Reference policy: unlimited attempts within a 5-minute budget,
    * 1 s → 60 s exponential backoff (util/Utils.java:922-925). */
  case class Policy(
      maxElapsedMs: Long = 5 * 60 * 1000,
      initialDelayMs: Long = 1000,
      maxDelayMs: Long = 60 * 1000,
      multiplier: Double = 2.0)

  /** A control-plane fault carrying its gRPC status code — the shape
    * a Datastream-backed [[graft.streaming.SourceAdmin]] surfaces
    * (the reference's ApiException hierarchy keyed by
    * Status.Code). */
  class ControlPlaneException(val code: String, msg: String,
      cause: Throwable = null) extends RuntimeException(msg, cause)

  /** The reference's abort predicate (util/Utils.java:901-925)
    * expressed over gRPC status codes: NOT_FOUND / INVALID_ARGUMENT /
    * FAILED_PRECONDITION / ALREADY_EXISTS / PERMISSION_DENIED (plus
    * bare IllegalArgumentException) abort the retry loop — these are
    * misconfiguration, not weather. Nested faults (an execution
    * wrapper whose cause wraps the status) abort on the same codes
    * EXCEPT NOT_FOUND, exactly mirroring abortOn's nested list — a
    * wrapped lookup that 404'd mid-flight is retried there. */
  val AbortCodes: Set[String] = Set("NOT_FOUND", "INVALID_ARGUMENT",
    "FAILED_PRECONDITION", "ALREADY_EXISTS", "PERMISSION_DENIED")
  val NestedAbortCodes: Set[String] = AbortCodes - "NOT_FOUND"

  def isControlPlaneAbort(t: Throwable): Boolean = t match {
    case e: ControlPlaneException => AbortCodes(e.code)
    case _: IllegalArgumentException => true
    case _ =>
      t.getCause match {
        case ee: java.util.concurrent.ExecutionException =>
          ee.getCause match {
            case e: ControlPlaneException => NestedAbortCodes(e.code)
            case _: IllegalArgumentException => true
            case _ => false
          }
        case _ => false
      }
  }

  /** Run a control-plane call under the reference's retry semantics:
    * abort codes fail the pipeline on the FIRST attempt (no retry —
    * DatastreamTableRegistryTest.java:75-155 verifies times(1));
    * every other fault (UNAVAILABLE, DEADLINE_EXCEEDED,
    * RESOURCE_EXHAUSTED, ABORTED, INTERNAL, …) is transient weather
    * and backs off under the standard budget. Exceptions already
    * classified ([[RecoverableSourceException]] /
    * [[FatalPipelineException]]) keep their classification. */
  def controlPlaneCall[T](policy: Policy = Policy(),
      sleep: Long => Unit = Thread.sleep)(op: => T): T =
    withBackoff(policy, sleep) {
      try op
      catch {
        case e: RecoverableSourceException => throw e
        case e: FatalPipelineException => throw e
        // cancellation and JVM-fatal conditions are NOT control-plane
        // weather: retrying an interrupt swallows shutdown, retrying
        // an Error masks it — both propagate untouched
        case e: InterruptedException => throw e
        case e: Throwable if isControlPlaneAbort(e) =>
          throw new FatalPipelineException(
            s"control-plane abort: ${e.getMessage}", e)
        case scala.util.control.NonFatal(e) =>
          throw new RecoverableSourceException(
            s"transient control-plane fault: ${e.getMessage}", e)
      }
    }

  /** Run `op`, retrying RecoverableSourceException per `policy`;
    * FatalPipelineException (and anything else) propagates at once.
    * `sleep` is injectable for tests. */
  def withBackoff[T](policy: Policy = Policy(),
      sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    val deadline = System.nanoTime() + policy.maxElapsedMs * 1000000L
    var delay = policy.initialDelayMs
    while (true) {
      try return op
      catch {
        case e: RecoverableSourceException =>
          if (System.nanoTime() + delay * 1000000L > deadline)
            throw new FatalPipelineException(
              s"retry budget exhausted: ${e.getMessage}", e)
          sleep(delay)
          delay = math.min((delay * policy.multiplier).toLong, policy.maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
