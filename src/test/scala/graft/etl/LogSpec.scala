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

  test("spark root logger config is untouched by the graft namespace opt-in") {
    Log.getLogger("graft.test.LogSpec")
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    assert(root.getName != "graft") // namespace config never replaces root
  }
}
