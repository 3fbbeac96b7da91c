package graft.etl

/** Operational failure notification — the reference
  * `src/etl/utils/notify.py` twin. The reference formats a
  * "[ETL {LEVEL}] …" message and hands it to a transport that silently
  * no-ops when unconfigured (notify.py:19-20 returns unless the SMTP_*
  * env vars are set); the transport itself never throws into the
  * pipeline (notify.py:31-32 swallows send errors). A Spark driver has
  * no SMTP stack by default, so the shipped transport LOGS — production
  * injects the same env-configured SMTP call, a pager webhook, etc. via
  * the `onFailure` parameter on [[graft.Run.execute]] /
  * [[Incremental.runFlow]].
  */
object Notify {

  /** Pluggable transport (message, level) — swap for SMTP/webhook in
    * production; tests capture it. Defaults to the engine's log. */
  @volatile var transport: (String, String) => Unit = (msg, level) =>
    Log.getLogger("graft.etl.Notify").error(s"[$level] $msg")

  /** notify.py's message shape: subject-tagged plain text. Never throws
    * (the reference swallows transport errors — a failed notification
    * must not mask the pipeline failure it reports). */
  def notify(text: String, level: String = "info"): Unit =
    try transport(s"[ETL ${level.toUpperCase}] WooCommerce Pipeline: $text", level)
    catch { case scala.util.control.NonFatal(_) => () }

  /** The default `onFailure` hook for run/flow entry points. */
  def onFailure(e: Throwable): Unit =
    notify(s"pipeline run failed: ${e.getMessage}", level = "error")
}
