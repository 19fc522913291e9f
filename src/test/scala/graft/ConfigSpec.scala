package graft

import graft.streaming.ConnectorApp
import org.scalatest.funsuite.AnyFunSuite

/** R17 config-resolution semantics (app.py:394-566): env beats CLI,
  * typed coercion, defaults, and required-key validation that names
  * every missing option.
  */
class ConfigSpec extends AnyFunSuite {
  private val base = Array("--app-id", "a", "--humio-host", "h", "--humio-token", "t")

  test("defaults mirror the reference's shipped configuration") {
    val cfg = ConnectorApp.parseConfig(base, Map.empty).toOption.get
    assert(cfg.bulkMaxSize == 200)        // app.py:485-491
    assert(cfg.flushWaitTimeSec == 10)    // app.py:493-499
    assert(cfg.retryTimerSec == 300)      // app.py:509-515
    assert(cfg.appidRandom == 1)          // app.py:517-523
    assert(cfg.enrich)
  }

  test("environment overrides CLI (app.py:541-557)") {
    val cfg = ConnectorApp.parseConfig(
      base ++ Array("--bulk-max-size", "50"),
      Map("BULK_MAX_SIZE" -> "99", "APP_ID" -> "env-app")).toOption.get
    assert(cfg.bulkMaxSize == 99, "env wins over CLI")
    assert(cfg.appId == "env-app")
  }

  test("flag coercion accepts true/1 (app.py:554-555)") {
    assert(!ConnectorApp.parseConfig(base ++ Array("--enrich", "false"), Map.empty)
      .toOption.get.enrich)
    assert(ConnectorApp.parseConfig(base, Map("ENRICH" -> "1")).toOption.get.enrich)
  }

  test("missing required options are all named (app.py:559-564)") {
    val Left(errors) = ConnectorApp.parseConfig(Array("--app-id", "a"), Map.empty)
    assert(errors.size == 2)
    assert(errors.exists(_.contains("humio-host")))
    assert(errors.exists(_.contains("humio-token")))
  }
}
