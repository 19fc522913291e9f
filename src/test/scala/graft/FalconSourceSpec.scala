package graft

import graft.sources.{FalconOffset, FalconTableProvider, StreamDesc, StubFalconServer}
import org.apache.spark.sql.streaming.Trigger

import scala.jdk.CollectionConverters._

/** The custom DataSource V2 source end-to-end: discovery → partitioned
  * offset-addressed reads → checkpointed resume → session refresh ticks.
  */
class FalconSourceSpec extends SparkSpec {
  import spark.implicits._

  private def line(p: Int, o: Long) = s"""{"p": $p, "o": $o}"""

  test("reads all partitions from offset 0 and resumes from checkpoint") {
    StubFalconServer.reset()
    StubFalconServer.register("app1", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 10L).foreach(o => StubFalconServer.push("app1", 0, o, line(0, o)))
    (0L until 5L).foreach(o => StubFalconServer.push("app1", 1, o, line(1, o)))

    val cp = java.nio.file.Files.createTempDirectory("falcon-cp").toString
    // foreachBatch, not the memory sink: only foreachBatch supports
    // recovering from an existing checkpoint, which the resume half needs
    def start() = spark.readStream
      .format(classOf[FalconTableProvider].getName)
      .option("appId", "app1")
      .load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          FalconSourceSpec.seen.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .trigger(Trigger.ProcessingTime(50L)).start()

    val q = start()
    q.processAllAvailable(); q.stop()
    val got = FalconSourceSpec.seen.asScala.toSeq
    assert(got.count(_._1 == 0L) == 10 && got.count(_._1 == 1L) == 5)

    // new events arrive; a fresh query on the SAME checkpoint must read
    // only them (offset resume, not replay)
    FalconSourceSpec.seen.clear()
    (10L until 13L).foreach(o => StubFalconServer.push("app1", 0, o, line(0, o)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val resumed = FalconSourceSpec.seen.asScala.toSeq.filter(_._1 == 0L).map(_._2).sorted
    assert(resumed == Seq(10L, 11L, 12L), s"expected only new offsets, got $resumed")
  }

  test("maxRowsPerTrigger drains a backlog in bounded micro-batches") {
    StubFalconServer.reset()
    StubFalconServer.register("app9", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    // 120-event backlog BEFORE the query starts — the restart-after-
    // downtime scenario admission control exists for
    (0L until 60L).foreach(o => StubFalconServer.push("app9", 0, o, line(0, o)))
    (0L until 60L).foreach(o => StubFalconServer.push("app9", 1, o, line(1, o)))
    val cp = java.nio.file.Files.createTempDirectory("falcon-cp").toString
    FalconSourceSpec.batchSizes.clear()
    val q = spark.readStream
      .format(classOf[graft.sources.FalconTableProvider].getName)
      .option("appId", "app9")
      .option("maxRowsPerTrigger", "40")   // 20 per partition per batch
      .load()
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        FalconSourceSpec.batchSizes.add(df.count()); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L)).start()
    q.processAllAvailable(); q.stop()
    val sizes = FalconSourceSpec.batchSizes.asScala.toSeq
    assert(sizes.sum == 120L, s"every event delivered exactly once, got $sizes")
    assert(sizes.forall(_ <= 40L), s"no batch may exceed the cap, got $sizes")
    assert(sizes.count(_ > 0) >= 3, s"backlog must drain across batches, got $sizes")
  }

  test("session refresh control calls happen while polling") {
    StubFalconServer.reset()
    StubFalconServer.register("app2", Seq(StreamDesc(0, 0)))  // interval 0 → refresh every poll
    StubFalconServer.push("app2", 0, 0L, line(0, 0))
    val cp = java.nio.file.Files.createTempDirectory("falcon-cp").toString
    val q = spark.readStream.format(classOf[FalconTableProvider].getName)
      .option("appId", "app2").load()
      .writeStream.format("memory").queryName("falcon3")
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(50L)).start()
    q.processAllAvailable(); q.stop()
    assert(StubFalconServer.refreshCalls.get() >= 1)
  }

  test("stream resource parsing matches the reference (FIXTURES §B2)") {
    val p = graft.sources.StreamResource.parse(
      "https://firehose.crowdstrike.com/sensors/entities/datafeed/v1/0?appId=cses2humio",
      1800, "sess-abc123")
    assert(p.partition == 0)
    assert(p.appId.contains("cses2humio"))
    assert(p.refreshDelaySec == 1530L)  // 85% of 1800
    assert(p.token == "sess-abc123")    // sessionToken.token, app.py:247
  }

  test("fetch without the discovered session token is rejected (app.py:68-75)") {
    StubFalconServer.reset()
    StubFalconServer.register("app4", Seq(StreamDesc(0, 1800)))
    StubFalconServer.push("app4", 0, 0L, line(0, 0))
    val client = new StubFalconServer.Client()
    val desc = client.discoverStreams("app4").head
    assert(desc.token == StubFalconServer.tokenFor("app4", 0))
    // the discovered token works; a stale/forged one is a 401
    assert(client.fetch("app4", 0, desc.token, 0L, 10L, 60000L).size == 1)
    intercept[graft.sources.FalconAuthException] {
      client.fetch("app4", 0, "forged", 0L, 10L, 60000L)
    }
  }

  test("fetch enforces the stream timeout (requests timeout, app.py:96)") {
    StubFalconServer.reset()
    StubFalconServer.register("app5", Seq(StreamDesc(0, 1800)))
    StubFalconServer.push("app5", 0, 0L, line(0, 0))
    val client = new StubFalconServer.Client()
    val tok = StubFalconServer.tokenFor("app5", 0)
    StubFalconServer.fetchDelayMs.set(100L)
    intercept[java.net.SocketTimeoutException] {
      client.fetch("app5", 0, tok, 0L, 10L, timeoutMs = 50L)
    }
    // a generous timeout tolerates the same latency
    assert(client.fetch("app5", 0, tok, 0L, 10L, timeoutMs = 60000L).size == 1)
    StubFalconServer.fetchDelayMs.set(0L)
  }

  test("AvailableNow: capped batches drain exactly to the prepared heads") {
    import graft.sources.{FalconMicroBatchStream, FalconOffset => FO}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    StubFalconServer.reset()
    StubFalconServer.register("appAN", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 9L).foreach(o => StubFalconServer.push("appAN", 0, o, line(0, o)))
    (0L until 4L).foreach(o => StubFalconServer.push("appAN", 1, o, line(1, o)))
    val stream = new FalconMicroBatchStream("appAN", maxRowsPerTrigger = Some(4))
    var cur = stream.initialOffset().asInstanceOf[FO]
    stream.prepareForTriggerAvailableNow()
    // rows arriving MID-DRAIN must wait for the next scheduled run
    (9L until 20L).foreach(o => StubFalconServer.push("appAN", 0, o, line(0, o)))
    val limit = ReadLimit.maxRows(4)
    var batches = 0
    var advanced = true
    while (advanced && batches < 20) {
      val next = stream.latestOffset(cur, limit).asInstanceOf[FO]
      advanced = next.offsets != cur.offsets
      if (advanced) {
        // admission control still bounds every drain batch
        val rows = next.offsets.map { case (p, o) =>
          o - cur.offsets.getOrElse(p, 0L) }.sum
        assert(rows <= 4, s"batch $batches read $rows rows, cap is 4")
        batches += 1
      }
      cur = next
    }
    assert(cur.offsets == Map(0 -> 9L, 1 -> 4L),
      s"drain must stop at the PREPARED heads, got ${cur.offsets}")
    assert(batches >= 4, s"a capped drain must take several batches, got $batches")
  }

  test("deserializeOffset returns the parsed offset verbatim (replay safety)") {
    import graft.sources.{FalconMicroBatchStream, FalconOffset => FO}
    StubFalconServer.reset()
    StubFalconServer.register("app7", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 9L).foreach(o => StubFalconServer.push("app7", 0, o, line(0, o)))
    (0L until 5L).foreach(o => StubFalconServer.push("app7", 1, o, line(1, o)))
    val stream = new FalconMicroBatchStream("app7")
    stream.latestOffset()   // carry-forward state is now {0: 9, 1: 5}
    // a committed batch boundary from the WAL names only partition 0:
    // merging carry-forward state into it would fast-forward partition 1
    // past its entire backlog (planInputPartitions would see from=5)
    val start = stream.deserializeOffset("""{"0": 5}""").asInstanceOf[FO]
    assert(start.offsets == Map(0 -> 5L),
      s"parsed offset must come back verbatim, got ${start.offsets}")
  }

  test("failed session refresh retries on the short timer, not the full interval") {
    import graft.sources.FalconMicroBatchStream
    StubFalconServer.reset()
    StubFalconServer.register("app8", Seq(StreamDesc(0, 1800)))  // 85% = 1530 s
    StubFalconServer.push("app8", 0, 0L, line(0, 0))
    // retry timer 0 for testability: a failed refresh is due again at once
    val stream = new FalconMicroBatchStream("app8", refreshRetrySec = 0)
    StubFalconServer.failRefreshes.set(true)
    stream.latestOffset()
    stream.latestOffset()
    assert(StubFalconServer.refreshCalls.get() == 2,
      "failed refreshes must retry every poll while the short timer is due")
    StubFalconServer.failRefreshes.set(false)
    stream.latestOffset()   // succeeds → next due after the 85% interval
    val after = StubFalconServer.refreshCalls.get()
    stream.latestOffset()
    assert(StubFalconServer.refreshCalls.get() == after,
      "a successful refresh must not re-fire until 85% of the interval")
  }

  test("latestOffset carries forward partitions missing from a discovery blip") {
    import graft.sources.{FalconMicroBatchStream, FalconOffset => FO}
    StubFalconServer.reset()
    StubFalconServer.register("app6", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 7L).foreach(o => StubFalconServer.push("app6", 0, o, line(0, o)))
    (0L until 3L).foreach(o => StubFalconServer.push("app6", 1, o, line(1, o)))
    val stream = new FalconMicroBatchStream("app6")
    val first = stream.latestOffset().asInstanceOf[FO]
    assert(first.offsets == Map(0 -> 7L, 1 -> 3L))
    // discovery transiently loses partition 1 (re-register with only 0):
    // the offset must RETAIN partition 1 at 3, not drop it — a drop would
    // replay its full history when it reappears
    StubFalconServer.reset()
    StubFalconServer.register("app6", Seq(StreamDesc(0, 1800)))
    (0L until 7L).foreach(o => StubFalconServer.push("app6", 0, o, line(0, o)))
    val blip = stream.latestOffset().asInstanceOf[FO]
    assert(blip.offsets == Map(0 -> 7L, 1 -> 3L),
      s"partition 1 must survive the discovery blip, got ${blip.offsets}")
  }

  test("offset JSON round-trips the reference checkpoint-file shape") {
    val o = FalconOffset(Map(0 -> 1235L, 1 -> 87L))
    assert(o.json() == """{"0": 1235, "1": 87}""")
    assert(FalconOffset.parse(o.json()) == o)
  }

  test("discovery retry falls back to a randomized app id (app.py:261-302, :30-35)") {
    import graft.sources.FalconDiscovery
    StubFalconServer.reset()
    // the base id has no streams; the seeded random fallback id does —
    // shaped like the reference's random_app_id: "{appId}-{digits}"
    // padded to 31 base chars (app.py:30-35). With appid-random=1 the
    // base id is tried while retires <= 1 (attempts 1-2); the first
    // random id is minted on attempt 3.
    val rnd = new scala.util.Random(42L)
    val fallback = "app-" + Seq.fill(31 - 3)(rnd.nextInt(10)).mkString
    StubFalconServer.register(fallback, Seq(StreamDesc(0, 1800)))
    val out = FalconDiscovery.discoverWithRetry(new StubFalconServer.Client(),
      "app", maxAttempts = 5, randomizeAfter = 1, seed = 42L)
    assert(out.appId == fallback)
    assert(out.streams.map(_.partition) == Seq(0))
    assert(out.attempts == 3, "two empty tries on the base id, then the random hit")
  }

  test("each randomized attempt mints a FRESH id (app.py:271-279)") {
    import graft.sources.FalconDiscovery
    StubFalconServer.reset()
    // nothing registered: all attempts fail; the SECOND random id (not a
    // reused first) must be the last one tried
    val rnd = new scala.util.Random(7L)
    val first = "app-" + Seq.fill(28)(rnd.nextInt(10)).mkString
    val second = "app-" + Seq.fill(28)(rnd.nextInt(10)).mkString
    val out = FalconDiscovery.discoverWithRetry(new StubFalconServer.Client(),
      "app", maxAttempts = 4, randomizeAfter = 1, seed = 7L)
    assert(out.streams.isEmpty && out.attempts == 4)
    assert(out.appId == second && first != second,
      s"attempt 4 must re-roll, got ${out.appId}")
  }

  test("discovery retry gives up after maxAttempts when nothing exists") {
    import graft.sources.FalconDiscovery
    StubFalconServer.reset()
    val out = FalconDiscovery.discoverWithRetry(new StubFalconServer.Client(),
      "ghost", maxAttempts = 3, randomizeAfter = 2, seed = 7L)
    assert(out.streams.isEmpty && out.attempts == 3)
  }

  test("a partition missing from one discovery tick plans with its last-seen token") {
    import graft.sources.{FalconMicroBatchStream, FalconInputPartition, StreamDesc}
    StubFalconServer.reset()
    StubFalconServer.register("appA", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 4L).foreach(o => StubFalconServer.push("appA", 0, o, line(0, o)))
    (0L until 4L).foreach(o => StubFalconServer.push("appA", 1, o, line(1, o)))
    val stream = new FalconMicroBatchStream("appA")
    stream.latestOffset()   // discovery sees both partitions, tokens learned
    // discovery blip: partition 1 vanishes from the NEXT tick, but the
    // committed end offset still has its pending rows to plan
    StubFalconServer.register("appA", Seq(StreamDesc(0, 1800)))
    val start = stream.deserializeOffset("""{"0": 0, "1": 0}""")
    val end = stream.deserializeOffset("""{"0": 4, "1": 4}""")
    val parts = stream.planInputPartitions(start, end)
      .map(_.asInstanceOf[FalconInputPartition])
    val p1 = parts.find(_.partition == 1).get
    assert(p1.token == StubFalconServer.tokenFor("appA", 1),
      s"missing partition must fall back to its last-seen token, got '${p1.token}'")
  }

  test("read budget splits across lagging partitions only (ADVICE r3)") {
    import graft.sources.{FalconMicroBatchStream, FalconOffset => FO, StreamDesc}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    StubFalconServer.reset()
    StubFalconServer.register("appB", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 5L).foreach(o => StubFalconServer.push("appB", 0, o, line(0, o)))
    (0L until 20L).foreach(o => StubFalconServer.push("appB", 1, o, line(1, o)))
    val stream = new FalconMicroBatchStream("appB")
    // partition 0 fully caught up (head=5); partition 1 lagging by 20
    val start = stream.deserializeOffset("""{"0": 5, "1": 0}""")
    val end = stream.latestOffset(start, ReadLimit.maxRows(8)).asInstanceOf[FO]
    assert(end.offsets(1) == 8L,
      s"the sole laggard gets the WHOLE budget (8), got ${end.offsets(1)}")
    assert(end.offsets(0) == 5L, "a caught-up partition must not advance")
  }
}

object FalconSourceSpec {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}
