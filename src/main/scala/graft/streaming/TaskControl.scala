package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.concurrent.TrieMap

/** Transport-agnostic task control plane: the reference's per-consumer
  * Redis pub/sub RPC (replication/consumer/task.py:77-107 — commands on
  * `{name}:manager`, replies published to `{name}:task:<verb>`) mapped
  * onto Spark streaming queries. The verb surface and reply topics are
  * reproduced exactly (`ACTIVE`/`INACTIVE`/`RESTARTING`/`COMPLETE`/
  * `PING`/`INFO`, task.py:82-107); the BUS is a seam — `publish` is a
  * callback, so a live deployment wires Redis/Kafka/HTTP while tests
  * capture replies directly. Status names follow the reference's
  * `Status` enum (task.py:15-22).
  *
  * Restart POLICY stays in [[Supervisor]] (task.py:123-152); this class
  * is the remote-control surface. A task's supervisor can be registered
  * so `INFO` reports its counters, mirroring the reference's
  * `number_of_restarts` / `current_number_of_restarts` fields.
  */
final class TaskControl(
    starters: Map[String, () => StreamingQuery],
    publish: (String, String) => Unit,
    supervisors: Map[String, Supervisor] = Map.empty,
    maxRestarts: Int = 3,
    minUptime: Int = 60) {

  private val running = TrieMap.empty[String, StreamingQuery]
  private val stopped = TrieMap.empty[String, String] // name -> final status

  /** Serializes state transitions: commands may arrive on concurrent
    * transport threads, and an unsynchronized check-then-act start would
    * let two ACTIVEs (or ACTIVE racing RESTARTING) both see "not active"
    * and start two queries — the first one unreferenced, unstoppable,
    * and double-processing into the sink. Command rate is human/control
    * scale, so one lock is the right tool.
    */
  private val transition = new Object

  /** Reference `Status.name` for one task. */
  def status(name: String): String =
    running.get(name) match {
      case Some(q) if q.isActive => "ACTIVE"
      // an operator-acknowledged final status (COMPLETE/INACTIVE after
      // the failure) outranks the stale exception — otherwise a task
      // whose query once failed reports ERROR forever, even after its
      // stop command was accepted and replied to
      case Some(q) if q.exception.isDefined => stopped.getOrElse(name, "ERROR")
      case Some(_) => stopped.getOrElse(name, "INACTIVE")
      case None => stopped.getOrElse(name, "NOT_STARTED")
    }

  private def start(name: String): Unit = transition.synchronized {
    if (!running.get(name).exists(_.isActive)) {
      val starter = starters.getOrElse(name,
        throw new IllegalArgumentException(s"unknown task: $name"))
      running.put(name, starter())
      stopped.remove(name)
    }
  }

  private def stop(name: String, finalStatus: String): Unit =
    transition.synchronized {
      val live = running.get(name).filter(_.isActive)
      live.foreach(_.stop())
      // A routine INACTIVE acknowledged against a query that had ALREADY
      // died keeps reporting ERROR — a crash absorbed by a scheduled stop
      // command must stay distinguishable from a clean stop in monitoring
      // (ADVICE r13). COMPLETE remains the deliberate operator
      // acknowledgment that outranks a stale exception (the r12 pin:
      // without it a once-failed task reports ERROR forever even after
      // its finish was accepted and replied to).
      if (live.isDefined || finalStatus == "COMPLETE"
          || !running.get(name).exists(_.exception.isDefined))
        stopped.put(name, finalStatus)
    }

  /** JSON string escape for the INFO reply: streaming failure messages
    * are multi-line by construction (StreamingQueryException embeds the
    * query-status block), so quote-swapping alone would emit invalid
    * JSON exactly when the diagnostics matter most.
    */
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Handle one command for `name` — the body of the reference's
    * `on_message` (task.py:80-107), replies on the same topics.
    */
  def onMessage(name: String, message: String): Unit = message match {
    case "ACTIVE" =>
      start(name); publish(s"$name:task:start", status(name))
    case "INACTIVE" =>
      stop(name, "INACTIVE"); publish(s"$name:task:stop", status(name))
    case "RESTARTING" =>
      stop(name, "INACTIVE"); start(name)
      publish(s"$name:task:restart", status(name))
    case "COMPLETE" =>
      stop(name, "COMPLETE"); publish(s"$name:task:finish", status(name))
    case "PING" =>
      publish(s"$name:task:ping", "OK")
    case "INFO" =>
      // snapshot under the transition lock so a reply racing a
      // concurrent start/stop cannot mix pre- and post-transition
      // fields in one message (ADVICE r4)
      val reply = transition.synchronized {
        val sup = supervisors.get(name)
        val lastFailed = running.get(name).flatMap(_.exception)
          .map(_.getMessage).orElse(sup.flatMap(_.lastError)).getOrElse("")
        // policy numbers come from the task's REGISTERED supervisor when
        // one exists — reporting this class's defaults while a custom
        // Supervisor enforces different limits would misstate the restart
        // policy to the operator
        val maxR = sup.map(_.maxRestarts).getOrElse(maxRestarts)
        val minU = sup.map(_.minUptimeMillis / 1000).getOrElse(minUptime.toLong)
        s"""{"status": "${status(name)}", "last_failed": "${jsonEscape(lastFailed)}", """ +
          s""""number_of_restarts": ${sup.map(_.totalFailures).getOrElse(0)}, """ +
          s""""current_number_of_restarts": ${sup.map(_.rapidFailures).getOrElse(0)}, """ +
          s""""max_restarts": $maxR, "min_up_time": $minU}"""
      }
      publish(s"$name:task:info", reply)
    case other =>
      throw new IllegalArgumentException(s"unknown command for $name: $other")
  }
}
