package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Restart supervisor for a replication query — the reference's consumer
  * task lifecycle (replication/consumer/task.py:123-152, tuned by
  * settings.yaml: `min_up_time: 60`, `max_read_fails_allowed: 3`,
  * `restart_delay: 30`).
  *
  * Policy, reproduced exactly: on failure, if the previous failure was
  * less than `minUptime` ago the rapid-failure counter increments,
  * otherwise it resets to 1 (the query "ran long enough" for the crash to
  * count as fresh). While the counter is below `maxRestarts`, sleep
  * `restartDelay` and start the query again; when it reaches
  * `maxRestarts`, give up — a consumer that cannot stay up for a minute
  * three times in a row has a real problem, and flap-restarting it only
  * hides the alert.
  *
  * Clock and sleep are injectable so the policy is unit-testable without
  * timers; production callers use the defaults.
  */
final class Supervisor(
    start: () => StreamingQuery,
    val maxRestarts: Int = 3,
    val minUptimeMillis: Long = 60000L,
    restartDelayMillis: Long = 30000L,
    now: () => Long = System.currentTimeMillis,
    sleep: Long => Unit = Thread.sleep) {

  @volatile private var totalFailuresV = 0
  @volatile private var rapidFailuresV = 0
  @volatile private var lastErrorV: Option[String] = None

  /** Lifetime failure count (reference `number_of_restarts`). */
  def totalFailures: Int = totalFailuresV

  /** Failures inside the current rapid-failure window (reference
    * `current_number_of_restarts`).
    */
  def rapidFailures: Int = rapidFailuresV

  /** Message of the most recent failure, if any. */
  def lastError: Option[String] = lastErrorV

  /** Run the query to completion under the restart policy. Returns true
    * when the query terminates cleanly; false when the restart budget is
    * exhausted (reference Status.INACTIVE).
    */
  def runBlocking(): Boolean = {
    while (true) {
      // the rapid-failure window measures UPTIME (start -> failure), not
      // failure-to-failure time: the latter silently counts the
      // restartDelay sleep as health, so with delay >= minUptime a query
      // that NEVER stays up a full minute still resets the window on
      // every crash and flap-restarts forever — exactly what the class
      // doc promises cannot happen
      val startedAt = now()
      val query = start()
      try {
        query.awaitTermination()
        return true
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          totalFailuresV += 1
          lastErrorV = Some(e.getMessage)
          rapidFailuresV =
            if ((now() - startedAt) < minUptimeMillis) rapidFailuresV + 1 else 1
          if (rapidFailuresV >= maxRestarts) return false
          sleep(restartDelayMillis)
      }
    }
    false // unreachable
  }
}
