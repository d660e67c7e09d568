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
