package graft.sources

import scala.annotation.tailrec

/** Connector-side resilience (SURVEY.md §2.1 S1; reference
  * `whalefinder/obis.py:17-47` — 5 retries with backoff on 429/5xx plus a
  * 1 req/s rate limit). Pure/injectable so the policy is unit-testable
  * without a network: the schedule and pacing are plain functions, the
  * sleeper is injected.
  */
object Retry {

  /** Exponential backoff schedule: attempt i sleeps `base·2^i`, capped. */
  def backoffSchedule(attempts: Int, baseMs: Long, capMs: Long): Seq[Long] =
    (0 until attempts).map(i => math.min(baseMs << i, capMs))

  /** Run `f`, retrying per `schedule` (one sleep per retry) on exceptions
    * `retryOn` accepts — default: all. Terminal failures (predicate false
    * or schedule exhausted) propagate. The reference's adapter likewise
    * retries only its status forcelist + connection errors, never 4xx
    * (`obis.py:23`).
    */
  def withRetries[T](schedule: Seq[Long], sleep: Long => Unit = Thread.sleep,
      retryOn: Exception => Boolean = _ => true)(f: () => T): T = {
    @tailrec def go(remaining: Seq[Long]): T =
      try f() catch {
        case e: Exception if remaining.nonEmpty && retryOn(e) =>
          sleep(remaining.head)
          go(remaining.tail)
        case e: Exception => throw e
      }
    go(schedule)
  }

  /** Rate pacing: given monotonically non-decreasing planned request times
    * and a minimum interval, the extra delay each request needs so that
    * consecutive (delayed) requests are ≥ `minIntervalMs` apart.
    */
  def paceDelays(requestTimesMs: Seq[Long], minIntervalMs: Long): Seq[Long] =
    requestTimesMs.headOption match {
      case None => Nil
      case Some(first) =>
        var prevEffective = first - minIntervalMs
        requestTimesMs.map { t =>
          val effective = math.max(t, prevEffective + minIntervalMs)
          prevEffective = effective
          effective - t
        }
    }
}
