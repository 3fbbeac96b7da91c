package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class LogSpec extends AnyFunSuite {

  test("getLogger configures the graft namespace once, idempotently, at INFO") {
    val a = Log.getLogger("graft.test.LogSpec")
    val b = Log.getLogger("graft.test.LogSpec")
    assert(a eq b) // slf4j caches by name — same instance both calls
    assert(a.isInfoEnabled)
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    val cfg = LogManager.getContext(false)
      .asInstanceOf[LoggerContext].getConfiguration
    // the namespace config exists, gates at INFO, and adds no appender
    // of its own (lines must not double through root's console)
    val ns = cfg.getLoggerConfig("graft.test.LogSpec")
    assert(ns.getName == "graft")
    assert(ns.getLevel == Level.INFO)
    assert(ns.getAppenders.isEmpty)
    assert(ns.isAdditive)
  }

  test("spark root logger level and appenders are untouched by the namespace opt-in") {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    def root = LogManager.getContext(false)
      .asInstanceOf[LoggerContext].getConfiguration.getRootLogger
    val (levelBefore, appendersBefore) =
      (root.getLevel, root.getAppenders.keySet().toString)
    Log.getLogger("graft.test.LogSpec")
    assert(root.getLevel == levelBefore)
    assert(root.getAppenders.keySet().toString == appendersBefore)
  }

  test("config survives a log4j2 reconfiguration (Spark swaps the Configuration in)") {
    Log.getLogger("graft.test.LogSpec")
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.reconfigure() // discards the installed namespace config
    val after = Log.getLogger("graft.test.LogSpec2")
    assert(after.isInfoEnabled) // re-ensured against the NEW configuration
    val cfg = ctx.getConfiguration
    assert(cfg.getLoggerConfig("graft.test.LogSpec2").getName == "graft")
  }
}
