package graft.etl

/** Structured-logging twin of reference `src/etl/utils/logging.py`.
  *
  * The reference's `get_logger(name)` lazily applies a one-time console
  * logging configuration (INFO level, a rich console handler rendering
  * time/level columns next to the bare message) and hands back the named
  * logger. The Spark-side twin does the same through the engine's own
  * logging stack (log4j2, already on every executor/driver classpath):
  * every call ensures an INFO-level configuration for the
  * `graft` logger namespace, additive into the engine's existing
  * console appender (whose pattern already renders the time/level/name
  * columns Rich renders), and every call returns the slf4j logger for
  * `name`. Spark's root logger configuration is left untouched: the
  * level is scoped to the `graft` namespace, so
  * `sparkContext.setLogLevel("WARN")` keeps silencing engine noise
  * while pipeline INFO lines still reach the console — exactly the
  * reference's "my logs at INFO regardless of ambient config" contract.
  */
object Log {

  /** Namespace configuration, re-checked against the CURRENT log4j2
    * Configuration on every call (a cheap map lookup): Spark swaps the
    * whole Configuration object in when a session initializes its
    * logging, which would discard a config installed earlier — a
    * JVM-scoped "done" flag would then silently drop every later INFO
    * line. Non-log4j2-core slf4j hosts (logback, bridges) are left
    * untouched: the configuration step is best-effort and the returned
    * slf4j logger works on any backend at that backend's levels. */
  private def ensureConfigured(): Unit = synchronized {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.LoggerConfig
    LogManager.getContext(false) match {
      case ctx: LoggerContext =>
        val cfg = ctx.getConfiguration
        if (cfg.getLoggerConfig("graft").getName != "graft") {
          // additive=true: events flow to the ancestors' (console)
          // appenders — the namespace config contributes only the INFO
          // level gate, never a second appender (no doubled lines)
          val logger = LoggerConfig.createLogger(
            true, Level.INFO, "graft", null,
            Array.empty[org.apache.logging.log4j.core.config.AppenderRef],
            null, cfg, null)
          cfg.addLogger("graft", logger)
          ctx.updateLoggers()
        }
      case _ => // not log4j2-core: no namespace opt-in to install
    }
  }

  /** The reference `get_logger` contract: ensure the namespace config,
    * return the named logger (slf4j facade — portable across
    * log4j2/logback hosts for library consumers). */
  def getLogger(name: String): org.slf4j.Logger = {
    try ensureConfigured()
    catch { case scala.util.control.NonFatal(_) => () }
    org.slf4j.LoggerFactory.getLogger(name)
  }
}
