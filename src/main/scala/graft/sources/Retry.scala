package graft.sources

/** Bounded retry with fixed backoff for connector-level fetches
  * (reference `src/etl/orchestration/flow.py:44-46`: `retries=2,
  * retry_delay_seconds=30`).
  *
  * Spark's task retry does NOT cover driver-side page loops
  * ([[PagedSource.fetchAll]]), and inside a DSv2 `PartitionReader` a
  * transient 5xx on page 7,000 of a long range would otherwise fail the
  * whole task (task-level retry then refetches every page of the range).
  * Retrying the single page fetch is both cheaper and the reference's
  * semantics.
  *
  * Permanent failures still propagate (S2): every attempt fails → the
  * last exception is rethrown unchanged.
  *
  * @param retries additional attempts after the first failure
  * @param delayMs fixed delay between attempts
  * @param sleep   injectable for tests (defaults to Thread.sleep)
  * @param retryOn failure classifier: false = propagate IMMEDIATELY
  *                (4xx client errors — a 401 never heals by retrying,
  *                and re-hammering an auth-rejecting API is hostile;
  *                [[HttpApiClient.transientOnly]] is the HTTP policy)
  */
final case class RetryPolicy(
    retries: Int = 2,
    delayMs: Long = 30000L,
    sleep: Long => Unit = Thread.sleep,
    retryOn: Throwable => Boolean = _ => true) {

  def apply[T](f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) if attempt < retries && retryOn(e) =>
          attempt += 1
          if (delayMs > 0) sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object RetryPolicy {
  /** No retries — first failure propagates immediately. */
  val none: RetryPolicy = RetryPolicy(retries = 0, delayMs = 0L)
}
