package graft.streaming

import graft.sources.{FalconDiscovery, FalconTableProvider, StreamDesc, StubFalconServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The assembled connector application — the runnable equivalent of the
  * reference's `cses2humio` CLI, on the Spark engine.
  *
  * Config resolution follows the reference exactly (app.py:394-566):
  * CLI `--key value` flags merged with environment variables where the
  * ENV WINS (app.py:541-557, key → UPPER_SNAKE), typed coercion for
  * int/flag options (app.py:544-555), and missing-required validation
  * that names every absent key (app.py:559-564). Defaults mirror the
  * shipped ones: bulk-max-size 200, flush-wait-time 10 s, retry-timer
  * 300 s, appid-random 1 (BASELINE.md).
  *
  * `--stub true` runs against the in-JVM protocol stub (no egress);
  * without it the app expects a live endpoint, which this build does not
  * ship (the HTTP client is the one stubbed seam).
  */
object ConnectorApp {

  case class Config(appId: String, humioHost: String, humioToken: String,
                    enrich: Boolean, bulkMaxSize: Int, flushWaitTimeSec: Int,
                    retryTimerSec: Int, appidRandom: Int, stub: Boolean,
                    maxRestarts: Int, streamTimeoutSec: Int, keepaliveSec: Int)

  /** CLI + env merge, env wins; typed coercion; required validation. */
  def parseConfig(args: Array[String], env: Map[String, String]): Either[Seq[String], Config] = {
    val cli = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    def get(key: String): Option[String] =
      env.get(key.toUpperCase.replace('-', '_')).orElse(cli.get(key))
    def int(key: String, default: Int): Int =
      get(key).map(_.toInt).getOrElse(default)
    def flag(key: String, default: Boolean): Boolean =
      get(key).map(v => v == "true" || v == "1").getOrElse(default)

    val required = Seq("app-id", "humio-host", "humio-token")
    val missing = required.filter(get(_).isEmpty)
    if (missing.nonEmpty) Left(missing.map(k => s"missing required option: --$k"))
    else Right(Config(
      appId = get("app-id").get,
      humioHost = get("humio-host").get,
      humioToken = get("humio-token").get,
      enrich = flag("enrich", default = true),
      bulkMaxSize = int("bulk-max-size", 200),
      flushWaitTimeSec = int("flush-wait-time", 10),
      retryTimerSec = int("retry-timer", 300),
      appidRandom = int("appid-random", 1),
      stub = flag("stub", default = false),
      maxRestarts = int("max-restarts", 3),
      streamTimeoutSec = int("stream-timeout", 60),
      keepaliveSec = int("keepalive", 10)))
  }

  /** Stand-in for the Humio bulk HTTP client: logs instead of POSTing
    * (zero-egress build; swap `post` for an HTTP call to go live). The
    * endpoint path and payload keyword follow the enrich mode exactly as
    * the reference selects them (app.py:365-374).
    */
  class LoggingSink(humioHost: String, enrich: Boolean) extends ConnectorPipeline.BulkSink {
    private val endpoint = ConnectorPipeline.HumioWire.endpoint(enrich)
    override def post(events: Seq[String]): Boolean = {
      ConnectorApp.posted.addAndGet(events.size)
      val body = ConnectorPipeline.HumioWire.body(enrich, events)
      println(s"[sink] POST $humioHost${endpoint.path}: ${events.size} " +
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
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"graft-connector-${cfg.appId}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    val cp = sys.env.getOrElse("CHECKPOINT_DIR",
      java.nio.file.Files.createTempDirectory("graft-connector-cp").toString)
    val lines = spark.readStream
      .format(classOf[FalconTableProvider].getName)
      .option("appId", found.appId)
      .option("streamTimeoutSec", cfg.streamTimeoutSec.toString)  // app.py:96
      .load()
      .select(col("value"))

    // R16 — SIGINT/SIGTERM stop the active query cleanly via a JVM
    // shutdown hook (the signal analog of app.py:219-222, :353-354)
    val shutdown = new Supervisor.Shutdown
    shutdown.installHook()

    val result = Supervisor.run(
      start = () => ConnectorPipeline.run(lines, new LoggingSink(cfg.humioHost, cfg.enrich), cp,
        host = java.net.InetAddress.getLocalHost.getHostName,
        streamId = cfg.appId,
        triggerMs = cfg.flushWaitTimeSec * 1000L,
        bulkMaxSize = cfg.bulkMaxSize,
        enrich = cfg.enrich),
      drain = q => if (cfg.stub) { q.processAllAvailable(); q.stop() }
                   else q.awaitTermination(),
      maxRestarts = cfg.maxRestarts,
      // the reference controller sleeps `keepalive` between liveness
      // checks of its stream threads (app.py:305-326); here that cadence
      // paces restart attempts after a query failure
      backoffMs = if (cfg.stub) 0L else cfg.keepaliveSec * 1000L,
      shutdown = Some(shutdown))

    println(s"[app] done: shipped=${posted.get} restarts=${result.restarts}" +
      result.fatal.map(e => s" FATAL=${e.getMessage}").getOrElse(""))
    spark.stop()
    if (result.fatal.nonEmpty) sys.exit(1)
  }
}
