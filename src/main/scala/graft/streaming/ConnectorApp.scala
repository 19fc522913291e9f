package graft.streaming

import graft.sources.{FalconDiscovery, FalconTableProvider, StreamDesc, StubFalconServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The assembled connector application — the runnable equivalent of the
  * reference's `cses2humio` CLI, on the Spark engine, with the
  * reference's exact argument surface (app.py:394-566):
  *
  *  - every flag and default mirrored: `--offset-file offset.db`,
  *    `--enrich`/`--metadata`/`--verbose`/`--exceptions` OFF by default
  *    (store_true semantics), `--falcon-url api.crowdstrike.com`,
  *    `--humio-url cloud.humio.com`, `--app-id cses2humio`,
  *    `--user-agent`, bulk-max-size 200, flush-wait-time 10,
  *    stream-timeout 60, retry-timer 300, appid-random 1, keepalive 10;
  *  - env-wins merge (key → UPPER_SNAKE, app.py:541-557), bools parsed
  *    as true/1/t (app.py:554-555);
  *  - required check names every missing variable env-style
  *    (app.py:559-564): FALCON_API_ID, FALCON_API_SECRET, HUMIO_TOKEN;
  *  - startup argument dump with secrets hidden (pp_args,
  *    app.py:381-392).
  *
  * Engine-only extras: `--stub true` runs against the in-JVM protocol
  * stub (no egress — the OAuth2/HTTP client is the one stubbed seam;
  * falcon-api credentials feed that seam when going live),
  * `--max-restarts` bounds supervision, and `--available-now` drains
  * the current backlog then exits (scheduled-job mode, same offset
  * checkpoint either way).
  */
object ConnectorApp {

  case class Config(offsetFile: String, enrich: Boolean, metadata: Boolean,
                    verbose: Boolean, exceptions: Boolean,
                    falconUrl: String, falconApiId: String, falconApiSecret: String,
                    humioUrl: String, humioToken: String,
                    appId: String, userAgent: String,
                    bulkMaxSize: Int, flushWaitTimeSec: Int, streamTimeoutSec: Int,
                    retryTimerSec: Int, appidRandom: Int, keepaliveSec: Int,
                    stub: Boolean, maxRestarts: Int,
                    availableNow: Boolean = false)

  // available-now is an ENGINE extension (no reference twin): drain the
  // current backlog under the same checkpoint contract, then exit —
  // run-as-a-scheduled-job mode (Trigger.AvailableNow)
  private val boolKeys =
    Set("enrich", "metadata", "verbose", "exceptions", "stub", "available-now")
  private val valueKeys = Set(
    "offset-file", "falcon-url", "falcon-api-id", "falcon-api-secret",
    "humio-url", "humio-token", "app-id", "user-agent", "bulk-max-size",
    "flush-wait-time", "stream-timeout", "retry-timer", "appid-random",
    "keepalive", "max-restarts")

  /** CLI + env merge, env wins; typed coercion; required validation. */
  def parseConfig(args: Array[String], env: Map[String, String]): Either[Seq[String], Config] = {
    // store_true flags may appear BARE (`--enrich`), the reference's
    // invocation style; `--enrich true` also works. Value options consume
    // the following token.
    val cliErrs = scala.collection.mutable.ListBuffer.empty[String]
    val cli = {
      val m = scala.collection.mutable.Map.empty[String, String]
      var i = 0
      while (i < args.length) {
        val a = args(i)
        if (a.startsWith("--")) {
          val k = a.stripPrefix("--")
          // a typo'd flag must say so, not demand a value for an option
          // that doesn't exist (argparse: "unrecognized arguments")
          if (!boolKeys(k) && !valueKeys(k)) {
            cliErrs += s"unrecognized arguments: --$k"; i += 1
          } else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
            m(k) = args(i + 1); i += 2
          } else {
            if (boolKeys(k)) m(k) = "true"   // bare flag = store_true
            // a VALUE option with no value is a usage error, as argparse
            // exits with "expected one argument" — silently keeping the
            // default would mask a mis-typed invocation
            else cliErrs += s"argument --$k: expected one argument"
            i += 1
          }
        } else i += 1
      }
      m.toMap
    }
    if (cliErrs.nonEmpty) return Left(cliErrs.toList)
    // env wins, but an EMPTY env var is ignored like the reference's
    // falsy-skip merge (`if env:`, app.py:543)
    def get(key: String): Option[String] =
      env.get(key.toUpperCase.replace('-', '_')).filter(_.nonEmpty)
        .orElse(cli.get(key))
    def str(key: String, default: String): String = get(key).getOrElse(default)
    def int(key: String, default: Int): Int =
      get(key).map(_.toInt).getOrElse(default)
    // store_true flags; env parsed as the reference does (app.py:554-555)
    def flag(key: String): Boolean =
      get(key).exists(v => Set("true", "1", "t").contains(v.toLowerCase))

    // required = the reference args with no default (app.py:559-564);
    // named env-style, as its error message does
    val required = Seq("falcon-api-id", "falcon-api-secret", "humio-token")
    val missing = required.filter(get(_).isEmpty)
    if (missing.nonEmpty)
      Left(missing.map(k => s"Please set missing variable: ${k.toUpperCase.replace('-', '_')}"))
    else Right(Config(
      offsetFile = str("offset-file", "offset.db"),
      enrich = flag("enrich"),
      metadata = flag("metadata"),
      verbose = flag("verbose"),
      exceptions = flag("exceptions"),
      falconUrl = str("falcon-url", "https://api.crowdstrike.com"),
      falconApiId = get("falcon-api-id").get,
      falconApiSecret = get("falcon-api-secret").get,
      humioUrl = str("humio-url", "https://cloud.humio.com"),
      humioToken = get("humio-token").get,
      appId = str("app-id", "cses2humio"),
      userAgent = str("user-agent", "cses2humio-spark/0.2"),
      bulkMaxSize = int("bulk-max-size", 200),
      flushWaitTimeSec = int("flush-wait-time", 10),
      streamTimeoutSec = int("stream-timeout", 60),
      retryTimerSec = int("retry-timer", 300),
      appidRandom = int("appid-random", 1),
      keepaliveSec = int("keepalive", 10),
      stub = flag("stub"),
      maxRestarts = int("max-restarts", 3),
      availableNow = flag("available-now")))
  }

  /** pp_args (app.py:381-392): dump the resolved arguments, secrets
    * hidden.
    */
  def ppConfig(cfg: Config): String = {
    def hide(v: String) = if (v.nonEmpty) "[HIDDEN]" else "NOT SET"
    val rows = Seq(
      "offset_file" -> cfg.offsetFile, "enrich" -> cfg.enrich,
      "metadata" -> cfg.metadata, "verbose" -> cfg.verbose,
      "exceptions" -> cfg.exceptions, "falcon_url" -> cfg.falconUrl,
      "falcon_api_id" -> cfg.falconApiId,
      "falcon_api_secret" -> hide(cfg.falconApiSecret),
      "humio_url" -> cfg.humioUrl, "humio_token" -> hide(cfg.humioToken),
      "app_id" -> cfg.appId, "user_agent" -> cfg.userAgent,
      "bulk_max_size" -> cfg.bulkMaxSize,
      "flush_wait_time" -> cfg.flushWaitTimeSec,
      "stream_timeout" -> cfg.streamTimeoutSec,
      "retry_timer" -> cfg.retryTimerSec, "appid_random" -> cfg.appidRandom,
      "keepalive" -> cfg.keepaliveSec)
    "Starting with the following arguments:\n" +
      rows.map { case (k, v) => f"\t$k%-16s \t\t=>\t $v" }.mkString("\n")
  }

  /** The OAuth2 seam (app.py:342-351): the reference builds its Falcon
    * client with (base_url, client_id, client_secret) and exits when no
    * token comes back. The HTTP exchange is the one stubbed surface in
    * this zero-egress build; the stub enforces the same contract —
    * non-empty credentials or no token.
    */
  trait TokenProvider {
    /** Right(bearer) or Left(failure reason). */
    def obtain(falconUrl: String, clientId: String, clientSecret: String): Either[String, String]
  }
  object StubTokenProvider extends TokenProvider {
    override def obtain(falconUrl: String, clientId: String,
                        clientSecret: String): Either[String, String] =
      if (clientId.nonEmpty && clientSecret.nonEmpty)
        Right(s"stub-oauth2-${clientId.hashCode.toHexString}")
      else Left("client credentials rejected")
  }

  /** Stand-in for the Humio bulk HTTP client: logs instead of POSTing
    * (zero-egress build; swap `post` for an HTTP call to go live). The
    * endpoint path and payload keyword follow the enrich mode exactly as
    * the reference selects them (app.py:365-374).
    */
  class LoggingSink(humioUrl: String, enrich: Boolean) extends ConnectorPipeline.BulkSink {
    private val endpoint = ConnectorPipeline.HumioWire.endpoint(enrich)
    override def post(events: Seq[String]): Boolean = {
      ConnectorApp.posted.addAndGet(events.size)
      val body = ConnectorPipeline.HumioWire.body(enrich, events)
      println(s"[sink] POST $humioUrl${endpoint.path}: ${events.size} " +
        s"${endpoint.keyword} (${body.length} bytes)")
      true
    }
  }
  val posted = new java.util.concurrent.atomic.AtomicLong(0)

  def main(args: Array[String]): Unit = {
    parseConfig(args, sys.env) match {
      case Left(errors) =>
        errors.foreach(System.err.println)
        sys.exit(2)
      case Right(cfg) => run(cfg)
    }
  }

  private def run(cfg: Config): Unit = {
    println(ppConfig(cfg))

    // OAuth2 first, like the reference (app.py:342-351): no token, no app
    println("[app] Obtaining OAuth2 token to Falcon")
    val token = StubTokenProvider.obtain(cfg.falconUrl, cfg.falconApiId, cfg.falconApiSecret) match {
      case Left(reason) =>
        System.err.println(s"[app] Failed to obtain OAuth2 token : $reason")
        sys.exit(1); ""
      case Right(t) => t
    }
    println(s"[app] OAuth2 token obtained (${token.take(12)}…)")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"graft-connector-${cfg.appId}")
      .getOrCreate()
    spark.sparkContext.setLogLevel(if (cfg.verbose) "INFO" else "WARN")

    if (cfg.stub) {
      StubFalconServer.reset()
      StubFalconServer.register(cfg.appId, Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
      (0L until 400L).foreach { o =>
        StubFalconServer.push(cfg.appId, (o % 2).toInt, o,
          s"""{"metadata": {"offset": $o, "eventCreationTime": ${1648464000000L + o}, "eventType": "T"}, "event": {"UserId": "u"}}""")
      }
    }

    // discovery with the reference's retry/randomize policy (R13)
    val found = FalconDiscovery.discoverWithRetry(
      new StubFalconServer.Client(), cfg.appId,
      maxAttempts = 3, randomizeAfter = cfg.appidRandom,
      sleepMs = if (cfg.stub) 0 else cfg.retryTimerSec * 1000L)
    println(s"[app] discovered ${found.streams.size} stream partition(s) as ${found.appId}")
    if (found.streams.isEmpty) { System.err.println("[app] no streams found"); sys.exit(1) }

    // the engine's offset WAL replaces the reference's offset FILE
    // (app.py:38-58) — the --offset-file path anchors the checkpoint dir
    val cp = sys.env.getOrElse("CHECKPOINT_DIR", s"${cfg.offsetFile}.checkpoint")
    val lines = spark.readStream
      .format(classOf[FalconTableProvider].getName)
      .option("appId", found.appId)
      .option("streamTimeoutSec", cfg.streamTimeoutSec.toString)  // app.py:96
      .load()
      .select(col("value"))

    // @host: HOST env override, else the FQDN — socket.getfqdn(),
    // app.py:366-368 (canonical name, not the short hostname)
    val host = sys.env.getOrElse("HOST",
      java.net.InetAddress.getLocalHost.getCanonicalHostName)

    // R16 — SIGINT/SIGTERM stop the active query cleanly via a JVM
    // shutdown hook (the signal analog of app.py:219-222, :353-354)
    val shutdown = new Supervisor.Shutdown
    shutdown.installHook()

    val result = Supervisor.run(
      start = () => ConnectorPipeline.run(lines, new LoggingSink(cfg.humioUrl, cfg.enrich), cp,
        host = host,
        streamId = cfg.appId,
        triggerMs = cfg.flushWaitTimeSec * 1000L,
        bulkMaxSize = cfg.bulkMaxSize,
        enrich = cfg.enrich,
        metadata = cfg.metadata,
        availableNow = cfg.availableNow),
      drain = q => if (cfg.stub) { q.processAllAvailable(); q.stop() }
                   else q.awaitTermination(),
      maxRestarts = cfg.maxRestarts,
      // the reference controller sleeps `keepalive` between liveness
      // checks of its stream threads (app.py:305-326); here that cadence
      // paces restart attempts after a query failure
      backoffMs = if (cfg.stub) 0L else cfg.keepaliveSec * 1000L,
      shutdown = Some(shutdown))

    // --exceptions: dump the stack like the reference's log.exception
    // path (app.py:204-206); otherwise just the message
    result.fatal.foreach { e =>
      if (cfg.exceptions) e.printStackTrace(System.err)
    }
    println(s"[app] done: shipped=${posted.get} restarts=${result.restarts}" +
      result.fatal.map(e => s" FATAL=${e.getMessage}").getOrElse(""))
    spark.stop()
    if (result.fatal.nonEmpty) sys.exit(1)
  }
}
