package graft

import graft.sources.{FalconTableProvider, StreamDesc, StubFalconServer}
import graft.streaming.{ConnectorPipeline, Supervisor}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.atomic.AtomicLong

/** Streaming-throughput bench against the reference's ONLY published
  * numbers (BASELINE.md: ≥20 events/s/partition ingest floor,
  * 200-event / 10 s flush trigger — `app.py:139-144,485-499`): drain a
  * seeded Falcon stub through the FULL connector pipeline — DSv2
  * source scan (R1) → tolerant parse (R3) → projection (R4) → KV
  * flatten (R5) → enrich (R6) → bulk sink chunks of 200 (R8/R10) with
  * offset checkpointing (R11) — under Trigger.AvailableNow, in both
  * the enriched and the raw pass-through (R7) wire modes.
  *
  * Events are realistic envelope lines (~220 bytes: metadata + a
  * 4-entry AuditKeyValues array so the flatten does real work), seeded
  * per partition into the in-JVM stub (the zero-egress stand-in for
  * the HTTPS transport — the measured path excludes only the socket,
  * exactly the part the reference's floor spends on network).
  *
  * Prints ONE JSON line and writes the complete record (per-batch
  * trigger durations included) to SPARK_GRAFT_STREAM_BENCH_FILE
  * (default BENCH_STREAM_r16.json). Events/s/partition divides by the
  * SOURCE partition count (the reference's per-partition thread
  * model), not the executor thread count.
  *
  * Besides the AvailableNow DRAIN (pre-seeded backlog), the bench runs
  * a SUSTAINED-load RATE LADDER — the resident-service regime the
  * reference actually lives in: per partition point (the configured
  * count and 32, deduped), a feeder thread offers events at each
  * ladder rate (SPARK_GRAFT_STREAM_RATES) for a fixed window while
  * the pipeline runs under a ProcessingTime trigger with SUPERVISION
  * ([[Supervisor.run]], R15) and LIVE session refresh (R12:
  * refreshIntervalSec = 20 s, so the 85% deadline fires repeatedly
  * during the window; each rung carries the observed refresh count).
  * The ladder climbs until a rung records kept_up=false, so the
  * committed record ends in one measured OVER-CAPACITY point (backlog
  * at feeder stop + drain time, no crash) and the headline is a
  * ceiling ("max sustained X ev/s"), not a floor. Delivered counts are
  * deduped by micro-batch id ([[CountingSink]]), so a supervised
  * restart's checkpoint replay cannot inflate throughput, and a rung
  * whose restart budget was exhausted records its fatal error.
  */
object BenchStream {

  /** Delivered-row tally, DEDUPED BY BATCH ID: at-least-once delivery
    * means a Supervisor restart replays the last uncommitted batch, and
    * a blind counter would double-count the replay — recording
    * kept_up=true with inflated throughput on exactly the runs where
    * the pipeline fell over (the r15 advice finding). [[begin]] runs
    * driver-side once per batch ATTEMPT; a re-seen id resets that
    * batch's tally so the LAST attempt counts once. Micro-batches of
    * one query are serial, so a single currentBatch cell suffices.
    */
  val perBatch =
    new java.util.concurrent.ConcurrentHashMap[Long, AtomicLong]()
  val currentBatch = new AtomicLong(-1L)
  val replayedBatches = new java.util.concurrent.atomic.AtomicInteger(0)
  def resetCounts(): Unit = {
    perBatch.clear(); currentBatch.set(-1L); replayedBatches.set(0)
  }
  def shippedTotal: Long = {
    var s = 0L
    val it = perBatch.values().iterator()
    while (it.hasNext) s += it.next().get()
    s
  }
  class CountingSink extends ConnectorPipeline.BulkSink {
    override def begin(batchId: Long): Unit = {
      val prev = perBatch.putIfAbsent(batchId, new AtomicLong(0))
      if (prev != null) { replayedBatches.incrementAndGet(); prev.set(0) }
      currentBatch.set(batchId)
    }
    override def post(events: Seq[String]): Boolean = {
      perBatch.computeIfAbsent(currentBatch.get(),
        _ => new AtomicLong(0)).addAndGet(events.size)
      true
    }
  }

  private def line(offset: Long, part: Int): String = {
    val t = 1700000000000L + offset * 13
    s"""{"metadata": {"offset": $offset, "eventCreationTime": $t, """ +
      s""""eventType": "AuthActivityAuditEvent"}, "event": {"UserId": """ +
      s""""user-$part-${offset % 997}", "OperationName": "twoFactorAuthenticate", """ +
      s""""Success": true, "AuditKeyValues": [""" +
      s"""{"Key": "target", "ValueString": "host-${offset % 31}"}, """ +
      s"""{"Key": "actor", "ValueString": "svc-${offset % 7}"}, """ +
      s"""{"Key": "quota", "ValueString": "${offset % 100}"}, """ +
      s"""{"Key": "actor", "ValueString": "svc-final"}]}}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8").toInt
    val perPart = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "50000").toLong
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH_FILE",
      "/root/repo/BENCH_STREAM_r16.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // seed: `parts` stub partitions × `perPart` envelope lines
    StubFalconServer.reset()
    StubFalconServer.register("bench",
      (0 until parts).map(p => StreamDesc(p, refreshIntervalSec = 1800)))
    (0 until parts).foreach { p =>
      (0L until perPart).foreach(o =>
        StubFalconServer.push("bench", p, o, line(o, p)))
    }
    val total = parts * perPart

    // per-batch trigger durations + engine-reported rates, per run
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) progress.add((p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
          p.processedRowsPerSecond))
      }
    })

    def drain(enrich: Boolean, tag: String): (Double, Seq[(Long, Long, Double)]) = {
      progress.clear(); resetCounts()
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-bench-stream-$tag").toString
      val lines = spark.readStream
        .format(classOf[FalconTableProvider].getName)
        .option("appId", "bench")
        // ~10 batches: per-batch latency stats need more than one trigger
        .option("maxRowsPerTrigger", (total / 10).max(1L).toString)
        .load()
      val t0 = System.nanoTime()
      val q = ConnectorPipeline.run(lines, new CountingSink, ckpt,
        host = "bench-host", streamId = "falcon", bulkMaxSize = 200,
        enrich = enrich, availableNow = true)
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      require(shippedTotal == total,
        s"$tag shipped $shippedTotal of $total events")
      import scala.jdk.CollectionConverters._
      (wall, progress.asScala.toSeq)
    }

    // JVM/codegen warm-up on a small slice so the measured runs aren't
    // charged for compilation (the Bench discipline)
    val warmParts = 1
    StubFalconServer.register("bench-warm", Seq(StreamDesc(0, 1800)))
    (0L until 2000L).foreach(o => StubFalconServer.push("bench-warm", 0, o, line(o, 0)))
    val warmCkpt = java.nio.file.Files.createTempDirectory("graft-bench-warm").toString
    ConnectorPipeline.run(
      spark.readStream.format(classOf[FalconTableProvider].getName)
        .option("appId", "bench-warm").load(),
      new CountingSink, warmCkpt, "h", "s",
      enrich = true, availableNow = true).awaitTermination()
    val _ = warmParts

    // fixed CPU-only calibration probe (same shape as graft.Bench's):
    // cross-epoch records self-normalize through it
    val calibrationSec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 400000000L, 1, 32)
        .selectExpr("sum(id % 1000003)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    val (wallE, progE) = drain(enrich = true, "enriched")
    val (wallR, progR) = drain(enrich = false, "raw")

    /** Sustained-rate rung: feed `rateEps` events/s across `nParts`
      * partitions for `secs` seconds while the enriched pipeline runs
      * supervised under a 500 ms ProcessingTime trigger, then stop the
      * feeder and measure the drain. Session refresh is LIVE: the 20 s
      * server interval puts the 85% refresh deadline at 17 s, so a
      * 60 s window exercises R12 several times per partition.
      *
      * kept_up is a FEED-TIME property: at feeder stop at most one
      * trigger admission (maxRowsPerTrigger = offered rate) may be
      * pending — i.e. the pipeline was current, not merely able to
      * drain the backlog inside the post-feed grace window. A rung
      * that fell behind records kept_up=false WITH its backlog and
      * drain time (never a crash); a rung whose supervisor exhausted
      * restarts records the fatal error and can never claim kept_up.
      */
    case class Sustained(parts: Int, offered: Long, secs: Int,
                         pushed: Long, shipped: Long, wall: Double,
                         backlogAtFeedEnd: Long, drainSec: Double,
                         drained: Boolean,
                         p50: Long, p99: Long, mx: Long, nBatches: Int,
                         refreshes: Int, restarts: Int, replayed: Int,
                         fatal: Option[String]) {
      def keptUp: Boolean = fatal.isEmpty && backlogAtFeedEnd <= offered
    }

    def sustained(nParts: Int, rateEps: Long, secs: Int): Sustained = {
      val appId = s"bench-sus-$nParts"
      StubFalconServer.reset()
      StubFalconServer.register(appId,
        (0 until nParts).map(p => StreamDesc(p, refreshIntervalSec = 20)))
      val refresh0 = StubFalconServer.refreshCalls.get()
      progress.clear(); resetCounts()
      val pushed = new AtomicLong(0)
      val feedDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      // feeder: 100 ms ticks, rate/10 events per tick, round-robin
      // across partitions with per-partition monotone offsets. Line
      // bodies come from a pre-built 4096-entry pool: building a fresh
      // ~220-byte JSON string per event caps a single feeder thread
      // near the pipeline's own throughput — the ladder must measure
      // the ENGINE's knee, not the feeder's
      val pool = Array.tabulate(4096)(i => line(i.toLong, i % 31))
      val feeder = new Thread(() => {
        val offsets = Array.fill(nParts)(0L)
        val perTick = (rateEps / 10).max(1L)
        val deadline = System.nanoTime() + secs * 1_000_000_000L
        var tick = 0L
        while (System.nanoTime() < deadline) {
          val tickStart = System.nanoTime()
          var i = 0L
          while (i < perTick) {
            val p = ((tick * perTick + i) % nParts).toInt
            StubFalconServer.push(appId, p, offsets(p),
              pool((offsets(p) % 4096).toInt))
            offsets(p) += 1
            i += 1
          }
          pushed.addAndGet(perTick)
          tick += 1
          val sleepMs = (tickStart + 100_000_000L - System.nanoTime()) / 1_000_000L
          if (sleepMs > 0) Thread.sleep(sleepMs)
        }
        feedDone.set(true)
      }, s"bench-feeder-$nParts")
      feeder.setDaemon(true)

      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-bench-sustained-$nParts").toString
      val t0 = System.nanoTime()
      var backlogAtFeedEnd = -1L
      var feedEndNs = 0L
      feeder.start()
      val res = Supervisor.run(
        start = () => ConnectorPipeline.run(
          spark.readStream.format(classOf[FalconTableProvider].getName)
            .option("appId", appId)
            .option("maxRowsPerTrigger", rateEps.toString)
            .load(),
          new CountingSink, ckpt, host = "bench-host", streamId = "falcon",
          triggerMs = 500L, bulkMaxSize = 200, enrich = true),
        drain = { q =>
          val hardDeadline = System.nanoTime() + (secs + 120) * 1_000_000_000L
          while ((!feedDone.get() || shippedTotal < pushed.get()) &&
              System.nanoTime() < hardDeadline) {
            if (feedDone.get() && backlogAtFeedEnd < 0) {
              backlogAtFeedEnd = pushed.get() - shippedTotal
              feedEndNs = System.nanoTime()
            }
            Thread.sleep(200)
          }
          q.stop(); q.awaitTermination()
        },
        maxRestarts = 3)
      val wall = (System.nanoTime() - t0) / 1e9
      val drainSec =
        if (feedEndNs == 0L) 0.0 else (System.nanoTime() - feedEndNs) / 1e9
      val shipped = shippedTotal
      // not a require: a pipeline that cannot keep up is a RESULT the
      // record must show (shipped < pushed + a large backlog), not a crash
      if (shipped < pushed.get())
        System.err.println(s"[bench-stream] sustained($nParts@$rateEps) did " +
          s"NOT fully drain: shipped $shipped of ${pushed.get()}")
      import scala.jdk.CollectionConverters._
      val durs = progress.asScala.toSeq.map(_._2).sorted
      def pct(p: Double): Long =
        if (durs.isEmpty) 0L
        else durs(((durs.size - 1) * p).toInt)
      Sustained(nParts, rateEps, secs, pushed.get(), shipped, wall,
        backlogAtFeedEnd.max(0L), drainSec, shipped == pushed.get(),
        pct(0.5), pct(0.99),
        if (durs.isEmpty) 0L else durs.last, durs.size,
        StubFalconServer.refreshCalls.get() - refresh0, res.restarts,
        replayedBatches.get(),
        // a run that exhausted its restart budget must carry its error,
        // not be recorded as if it merely ran slow (the r15 advice)
        res.fatal.map(e => s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }

    // RATE LADDER (per partition point): step the offered rate until a
    // rung records kept_up=false — the committed record then ends in
    // ONE over-capacity point (backlog + drain, no crash), making the
    // headline a measured CEILING ("max sustained X ev/s"), not a
    // floor. The second partition point is skipped when it equals the
    // first (SPARK_GRAFT_STREAM_PARTS=32 used to record the same
    // configuration twice under two labels).
    val susSecs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SUSTAIN_SEC", "60").toInt
    val rates: Seq[Long] = sys.env.get("SPARK_GRAFT_STREAM_RATES")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_RATE"))
      .getOrElse("80000,120000,160000,240000,320000")
      .split(',').map(_.trim.toLong).toSeq
    val partPoints = Seq(parts, 32).distinct
    val ladders: Seq[(Int, Seq[Sustained])] = partPoints.map { np =>
      val rungs = scala.collection.mutable.ArrayBuffer[Sustained]()
      var stop = false
      for (r <- rates if !stop) {
        val s0 = sustained(np, r, susSecs)
        System.err.println(s"[bench-stream] rung parts=$np rate=$r: " +
          s"kept_up=${s0.keptUp} backlog=${s0.backlogAtFeedEnd} " +
          f"drain=${s0.drainSec}%.1fs restarts=${s0.restarts}")
        rungs += s0
        if (!s0.keptUp) stop = true
      }
      np -> rungs.toSeq
    }

    def stats(wall: Double, prog: Seq[(Long, Long, Double)]): (Double, Double, Long, Long) = {
      val eps = total / wall
      val perPartRate = eps / parts
      val durs = prog.map(_._2).sorted
      val med = if (durs.isEmpty) 0L else durs(durs.size / 2)
      val max = if (durs.isEmpty) 0L else durs.last
      (eps, perPartRate, med, max)
    }
    val (epsE, ppE, medE, maxE) = stats(wallE, progE)
    val (epsR, ppR, medR, maxR) = stats(wallR, progR)
    def f(v: Double): String = BigDecimal(v)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    // the reference's floor: ≥20 events/s/partition (app.py:485-499)
    val vsFloor = ppE / 20.0
    def susJson(s: Sustained): String =
      s"""{"partitions": ${s.parts}, "offered_events_per_sec": ${s.offered},
         |      "feed_sec": ${s.secs}, "pushed": ${s.pushed}, "shipped": ${s.shipped},
         |      "kept_up": ${s.keptUp}, "drained": ${s.drained},
         |      "achieved_events_per_sec": ${f(s.shipped / s.wall)},
         |      "backlog_at_feed_end": ${s.backlogAtFeedEnd},
         |      "drain_sec": ${f(s.drainSec)}, "n_batches": ${s.nBatches},
         |      "batch_trigger_ms_p50": ${s.p50}, "batch_trigger_ms_p99": ${s.p99},
         |      "batch_trigger_ms_max": ${s.mx},
         |      "session_refreshes": ${s.refreshes}, "restarts": ${s.restarts},
         |      "replayed_batches": ${s.replayed},
         |      "fatal": ${s.fatal.map(m =>
               "\"" + m.replace("\\", "/").replace("\"", "'") + "\"")
               .getOrElse("null")}}""".stripMargin
    // per-partition-point headline: the highest kept-up rate (the
    // measured ceiling) and the first over-capacity rung (the knee)
    def maxKept(rungs: Seq[Sustained]): Long =
      rungs.filter(_.keptUp).map(_.offered).foldLeft(0L)(math.max)
    def knee(rungs: Seq[Sustained]): Option[Long] =
      rungs.find(!_.keptUp).map(_.offered)
    val headLadder = ladders.head._2
    println(s"""{"metric":"stream_events_per_sec","value":${f(epsE)},""" +
      s""""unit":"events/sec","events":$total,"partitions":$parts,""" +
      s""""per_partition":${f(ppE)},"raw_events_per_sec":${f(epsR)},""" +
      s""""raw_per_partition":${f(ppR)},"vs_reference_floor":${f(vsFloor)},""" +
      s""""wall_sec":${f(wallE)},"raw_wall_sec":${f(wallR)},""" +
      s""""sustained_max_kept_up_eps":${maxKept(headLadder)},""" +
      s""""sustained_knee_eps":${knee(headLadder).map(_.toString).getOrElse("null")},""" +
      s""""ladders":${ladders.map { case (np, rs) =>
        s""""$np":{"max_kept_up":${maxKept(rs)},"knee":${
          knee(rs).map(_.toString).getOrElse("null")}}"""
      }.mkString("{", ",", "}")}}""")
    def batches(prog: Seq[(Long, Long, Double)]): String =
      prog.map { case (n, ms, rps) =>
        s"""    {"rows": $n, "trigger_ms": $ms, "rate": ${f(rps)}}"""
      }.mkString("[\n", ",\n", "\n  ]")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(benchFile),
      s"""{\n  "events": $total, "partitions": $parts,\n""" +
        s"""  "calibration_sec": ${BigDecimal(calibrationSec)
               .setScale(3, BigDecimal.RoundingMode.HALF_UP)},\n""" +
        s"""  "reference_floor_events_per_sec_per_partition": 20,\n""" +
        s"""  "reference_trigger": "200 events / 10 s",\n""" +
        s"""  "enriched": {"wall_sec": ${f(wallE)}, "events_per_sec": ${f(epsE)},\n""" +
        s"""    "events_per_sec_per_partition": ${f(ppE)},\n""" +
        s"""    "vs_reference_floor": ${f(vsFloor)},\n""" +
        s"""    "batch_trigger_ms_median": $medE, "batch_trigger_ms_max": $maxE,\n""" +
        s"""    "batches": ${batches(progE)}},\n""" +
        s"""  "raw": {"wall_sec": ${f(wallR)}, "events_per_sec": ${f(epsR)},\n""" +
        s"""    "events_per_sec_per_partition": ${f(ppR)},\n""" +
        s"""    "batch_trigger_ms_median": $medR, "batch_trigger_ms_max": $maxR,\n""" +
        s"""    "batches": ${batches(progR)}},\n""" +
        s"""  "sustained_ladder": ${ladders.map { case (np, rs) =>
          s"""{\n    "partitions": $np,\n""" +
            s"""    "max_kept_up_eps": ${maxKept(rs)},\n""" +
            s"""    "knee_offered_eps": ${knee(rs).map(_.toString).getOrElse("null")},\n""" +
            s"""    "rungs": [\n      ${rs.map(susJson).mkString(",\n      ")}\n    ]\n  }"""
        }.mkString("[", ", ", "]")}\n}\n""")
    catch { case e: Exception =>
      System.err.println(s"[bench-stream] could not write $benchFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
