package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's controller loop (app.py:305-326): watch the running
  * pipeline, restart it when it dies, give up after too many failures.
  *
  * Spark already restarts TASKS; this supervises the QUERY — the analog
  * of the reference's thread-per-partition watchdog (a dead partition
  * thread is re-fetched and restarted every keepalive tick). Each restart
  * resumes from the checkpoint, so supervision composes with
  * at-least-once delivery instead of re-reading history.
  */
object Supervisor {

  /** Outcome of a supervised run: how many restarts happened and the
    * terminal error if the budget was exhausted.
    */
  case class Result(restarts: Int, fatal: Option[Throwable])

  /** R16 — graceful shutdown (app.py:219-222, :353-354). The reference
    * installs SIGINT/SIGTERM handlers that set `exit_event` so stream
    * threads drain and exit; the JVM analog is a shutdown hook (the JVM
    * runs hooks on both signals). `requestStop` stops the ACTIVE query
    * cooperatively — the in-flight micro-batch completes and commits its
    * checkpoint, so nothing is lost or replayed on the next start — and
    * marks the supervisor so a stop-induced exit is never "restarted".
    */
  final class Shutdown {
    private val active =
      new java.util.concurrent.atomic.AtomicReference[StreamingQuery](null)
    @volatile private var requested = false
    def stopRequested: Boolean = requested
    private[streaming] def track(q: StreamingQuery): Unit = active.set(q)
    def requestStop(): Unit = {
      requested = true
      Option(active.get()).foreach(q => try q.stop() catch { case _: Throwable => () })
    }
    /** Install as a JVM shutdown hook; returns the hook thread. */
    def installHook(): Thread = {
      val t = new Thread(() => requestStop(), "graft-shutdown")
      Runtime.getRuntime.addShutdownHook(t)
      t
    }
  }

  /** Run `start` to completion, restarting on failure. `start` must build
    * a FRESH query on the SAME checkpoint each attempt (app.py:316-317
    * re-fetches the stream and restarts the thread).
    *
    * `drain` makes the query do its work and return — in production
    * `_.awaitTermination()`, in tests `q => { q.processAllAvailable(); q.stop() }`.
    */
  def run(start: () => StreamingQuery,
          drain: StreamingQuery => Unit,
          maxRestarts: Int,
          backoffMs: Long = 0L,
          shutdown: Option[Shutdown] = None): Result = {
    var attempt = 0
    while (true) {
      // start() INSIDE the try: a failure while (re)starting — transient
      // checkpoint lock, IO error — must count against the budget too,
      // not crash the supervisor
      var q: StreamingQuery = null
      try {
        if (shutdown.exists(_.stopRequested)) return Result(attempt, None)
        q = start()
        shutdown.foreach { s =>
          s.track(q)
          // close the start()/track() race: a stop requested while the
          // query was starting found nothing to stop — deliver it now,
          // or drain would block on a query nobody will ever stop
          if (s.stopRequested) q.stop()
        }
        drain(q)
        return Result(attempt, None)
      } catch {
        case e: Throwable =>
          if (q != null) { try q.stop() catch { case _: Throwable => () } }
          // a requested stop that raced a failing drain is a clean exit,
          // not a crash — never restart past it
          if (shutdown.exists(_.stopRequested)) return Result(attempt, None)
          if (attempt >= maxRestarts) return Result(attempt, Some(e))
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
