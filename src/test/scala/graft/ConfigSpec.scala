package graft

import graft.streaming.ConnectorApp
import org.scalatest.funsuite.AnyFunSuite

/** R17 config-resolution semantics (app.py:394-566): env beats CLI,
  * typed coercion, the reference's exact defaults, and required-key
  * validation that names every missing variable env-style.
  */
class ConfigSpec extends AnyFunSuite {
  private val base = Array(
    "--falcon-api-id", "fid", "--falcon-api-secret", "fsec",
    "--humio-token", "t")

  test("a value option with no value is a usage error, not a silent default") {
    // argparse exits with "expected one argument" here; silently keeping
    // the default would mask `--app-id --enrich` typos (ADVICE r3)
    val Left(errs) = ConnectorApp.parseConfig(
      base ++ Array("--app-id", "--enrich"), Map.empty)
    assert(errs.exists(_.contains("--app-id: expected one argument")), errs.toString)
    val Left(atEnd) = ConnectorApp.parseConfig(base ++ Array("--app-id"), Map.empty)
    assert(atEnd.exists(_.contains("--app-id: expected one argument")))
    // bare BOOL flags stay legal store_true style
    assert(ConnectorApp.parseConfig(base ++ Array("--enrich"), Map.empty)
      .toOption.get.enrich)
    // a typo'd flag is "unrecognized", not "expected one argument"
    val Left(unk) = ConnectorApp.parseConfig(
      base ++ Array("--verbos", "--enrich"), Map.empty)
    assert(unk.exists(_.contains("unrecognized arguments: --verbos")), unk.toString)
  }

  test("defaults mirror the reference's shipped configuration") {
    val cfg = ConnectorApp.parseConfig(base, Map.empty).toOption.get
    assert(cfg.offsetFile == "offset.db")          // app.py:402-408
    assert(!cfg.enrich && !cfg.metadata)           // store_true → off
    assert(!cfg.verbose && !cfg.exceptions)
    assert(cfg.falconUrl == "https://api.crowdstrike.com")
    assert(cfg.humioUrl == "https://cloud.humio.com")
    assert(cfg.appId == "cses2humio")              // app.py advanced default
    assert(cfg.bulkMaxSize == 200)                 // app.py:485-491
    assert(cfg.flushWaitTimeSec == 10)             // app.py:493-499
    assert(cfg.streamTimeoutSec == 60)             // app.py:501-507
    assert(cfg.retryTimerSec == 300)               // app.py:509-515
    assert(cfg.appidRandom == 1)                   // app.py:517-523
    assert(cfg.keepaliveSec == 10)                 // app.py:525-531
  }

  test("environment overrides CLI (app.py:541-557)") {
    val cfg = ConnectorApp.parseConfig(
      base ++ Array("--bulk-max-size", "50"),
      Map("BULK_MAX_SIZE" -> "99", "APP_ID" -> "env-app")).toOption.get
    assert(cfg.bulkMaxSize == 99, "env wins over CLI")
    assert(cfg.appId == "env-app")
  }

  test("flag coercion accepts true/1/t (app.py:554-555)") {
    assert(ConnectorApp.parseConfig(base ++ Array("--enrich", "true"), Map.empty)
      .toOption.get.enrich)
    assert(ConnectorApp.parseConfig(base, Map("ENRICH" -> "1")).toOption.get.enrich)
    assert(ConnectorApp.parseConfig(base, Map("METADATA" -> "T")).toOption.get.metadata)
    assert(!ConnectorApp.parseConfig(base ++ Array("--enrich", "false"), Map.empty)
      .toOption.get.enrich)
  }

  test("missing required variables are all named env-style (app.py:559-564)") {
    val Left(errors) = ConnectorApp.parseConfig(Array("--falcon-api-id", "fid"), Map.empty)
    assert(errors.size == 2)
    assert(errors.exists(_.contains("FALCON_API_SECRET")))
    assert(errors.exists(_.contains("HUMIO_TOKEN")))
  }

  test("bare store_true flags parse like the reference CLI") {
    val cfg = ConnectorApp.parseConfig(
      Array("--enrich", "--metadata", "--falcon-api-id", "x",
        "--falcon-api-secret", "y", "--humio-token", "t", "--verbose"),
      Map.empty).toOption.get
    assert(cfg.enrich && cfg.metadata && cfg.verbose && !cfg.exceptions)
    assert(cfg.falconApiId == "x" && cfg.humioToken == "t",
      "bare flags must not swallow following options")
  }

  test("empty environment variables are ignored (`if env:`, app.py:543)") {
    val cfg = ConnectorApp.parseConfig(base,
      Map("HUMIO_TOKEN" -> "", "BULK_MAX_SIZE" -> "")).toOption.get
    assert(cfg.humioToken == "t", "empty env must not beat the CLI value")
    assert(cfg.bulkMaxSize == 200, "empty env must not crash int coercion")
  }

  test("OAuth2 seam: credentials yield a token, empties are rejected (app.py:342-351)") {
    assert(ConnectorApp.StubTokenProvider.obtain("u", "id", "sec").isRight)
    assert(ConnectorApp.StubTokenProvider.obtain("u", "", "sec").isLeft)
    assert(ConnectorApp.StubTokenProvider.obtain("u", "id", "").isLeft)
  }

  test("the argument dump hides secrets (pp_args, app.py:381-392)") {
    val cfg = ConnectorApp.parseConfig(base, Map.empty).toOption.get
    val pp = ConnectorApp.ppConfig(cfg)
    val tokenRow = pp.linesIterator.find(_.contains("humio_token")).get
    assert(tokenRow.contains("[HIDDEN]") && !tokenRow.trim.endsWith("t"),
      s"token must not print: $tokenRow")
    val secretRow = pp.linesIterator.find(_.contains("falcon_api_secret")).get
    assert(secretRow.contains("[HIDDEN]") && !pp.contains("fsec"))
    assert(pp.contains("fid"), "non-secret values print")
  }
}
