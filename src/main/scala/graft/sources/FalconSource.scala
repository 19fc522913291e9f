package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 source with the Falcon Event Streams protocol shape
  * (reference `app.py`): partitioned, offset-addressed, resumable event
  * streams behind a discovery + session-refresh control plane.
  *
  * Protocol mapping (SURVEY §2.1):
  *  - stream discovery (R13, app.py:261-302)  → [[FalconClient.discoverStreams]],
  *    called in [[FalconMicroBatchStream#planInputPartitions]];
  *  - session refresh at 85% of the server interval (R12, app.py:178-197,
  *    factor app.py:256) → driver-side [[FalconMicroBatchStream#latestOffset]]
  *    tick, where the reference schedules it between events;
  *  - offset-addressed chunked reads (R1, app.py:92-102) →
  *    [[FalconPartitionReader]], one per stream partition per micro-batch;
  *  - the offset checkpoint file `{"<partition>": nextOffset}` (R11,
  *    app.py:38-58) → [[FalconOffset]] JSON, persisted by the engine's
  *    offset WAL (crash-atomic, unlike the reference's read-modify-write).
  *
  * The client is pluggable; [[StubFalconClient]] is the in-JVM stand-in
  * for the HTTPS protocol (zero-egress environment — swap `StubFalconClient`
  * for an HTTP implementation to go live; the Spark plumbing is identical).
  * Usage: `spark.readStream.format(classOf[FalconTableProvider].getName)
  * .option("appId", …).load()` → rows of (partition, offset, value).
  */
class FalconTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FalconSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FalconTable(properties.asScala.toMap)
}

object FalconSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

/** One discovered stream partition (parse_stream, app.py:244-258),
  * including the per-stream session token the data-feed GET must carry
  * as `Authorization: Token <token>` (app.py:68-69, parsed app.py:247).
  */
case class StreamDesc(partition: Int, refreshIntervalSec: Int, token: String = "")

/** Discovery-resource parsing, mirroring the reference exactly
  * (FIXTURES.md §B2): the partition number is the LAST PATH SEGMENT of
  * `dataFeedURL` (app.py:61-62), the app id is its `appId` query param
  * (app.py:251), the session token is `sessionToken.token` of the
  * discovery resource (app.py:247), and the refresh deadline is 85% of
  * the server-provided interval (app.py:256).
  */
object StreamResource {
  case class Parsed(partition: Int, appId: Option[String], refreshDelaySec: Long,
                    token: String)

  def parse(dataFeedUrl: String, refreshIntervalSec: Int,
            sessionToken: String = ""): Parsed = {
    val uri = new java.net.URI(dataFeedUrl)
    val partition = uri.getPath.split('/').last.toInt
    val appId = Option(uri.getQuery).flatMap(
      _.split('&').map(_.split("=", 2))
        .collectFirst { case Array("appId", v) => v })
    Parsed(partition, appId, (refreshIntervalSec * 0.85).toLong, sessionToken)
  }
}

/** Auth failure on a data-feed fetch — the protocol's 401 (wrong or
  * expired session token).
  */
class FalconAuthException(msg: String) extends RuntimeException(msg)

/** The Falcon protocol surface the source depends on. `fetch` carries the
  * discovered session token (bearer credential of every stream GET,
  * app.py:68-75) and the stream timeout (`requests.get(timeout=...)`,
  * app.py:96 / `--stream-timeout`); implementations reject a bad token
  * with [[FalconAuthException]] and a slow read with a timeout error.
  */
trait FalconClient extends Serializable {
  def discoverStreams(appId: String): Seq[StreamDesc]
  def refreshSession(appId: String, partition: Int): Boolean
  def latestOffset(appId: String, partition: Int): Long
  /** events with offset in [from, until), in offset order */
  def fetch(appId: String, partition: Int, token: String,
            from: Long, until: Long, timeoutMs: Long): Seq[(Long, String)]
}

/** Deterministic in-JVM stub of the Falcon endpoints, keyed by appId.
  * Tests (and the demo) feed it; executors reach it through the shared
  * registry (single-JVM local mode — an HTTP client replaces this on a
  * real cluster).
  */
object StubFalconServer {
  // discovery resources are stored as (dataFeedURL, refreshInterval,
  // sessionToken) — the WIRE shape — and re-parsed on every discovery via
  // [[StreamResource.parse]], exactly like the reference client does
  private val streams =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Int, String)]]()
  private val events =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.util.concurrent.ConcurrentSkipListMap[Long, String]]()
  val refreshCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  // simulated per-fetch latency, for stream-timeout tests
  val fetchDelayMs = new java.util.concurrent.atomic.AtomicLong(0)
  // simulated refresh failures (non-200), for refresh-retry tests
  val failRefreshes = new java.util.concurrent.atomic.AtomicBoolean(false)

  def reset(): Unit = {
    streams.clear(); events.clear(); refreshCalls.set(0)
    fetchDelayMs.set(0); failRefreshes.set(false)
  }

  /** Deterministic session token the server would mint per stream. */
  def tokenFor(appId: String, partition: Int): String = s"sess-$appId-$partition"

  def register(appId: String, descs: Seq[StreamDesc]): Unit = {
    streams.put(appId, descs.map(d =>
      (s"https://stub.local/sensors/entities/datafeed/v1/${d.partition}?appId=$appId",
        d.refreshIntervalSec, tokenFor(appId, d.partition))))
    descs.foreach(d => events.putIfAbsent((appId, d.partition),
      new java.util.concurrent.ConcurrentSkipListMap[Long, String]()))
  }

  def push(appId: String, partition: Int, offset: Long, line: String): Unit =
    events.get((appId, partition)).put(offset, line)

  class Client extends FalconClient {
    override def discoverStreams(appId: String): Seq[StreamDesc] =
      Option(streams.get(appId)).getOrElse(Seq.empty).map {
        case (url, interval, token) =>
          val p = StreamResource.parse(url, interval, token)
          StreamDesc(p.partition, interval, p.token)
      }
    override def refreshSession(appId: String, partition: Int): Boolean = {
      refreshCalls.incrementAndGet(); !failRefreshes.get()
    }
    override def latestOffset(appId: String, partition: Int): Long =
      Option(events.get((appId, partition)))
        .filterNot(_.isEmpty).map(_.lastKey() + 1).getOrElse(0L)
    override def fetch(appId: String, partition: Int, token: String,
                       from: Long, until: Long, timeoutMs: Long): Seq[(Long, String)] = {
      if (token != tokenFor(appId, partition))
        throw new FalconAuthException(
          s"401: bad session token for $appId/$partition")
      // the HTTP client enforces its timeout socket-side; the stub
      // simulates it against the configured artificial latency
      if (fetchDelayMs.get() > timeoutMs)
        throw new java.net.SocketTimeoutException(
          s"stream read exceeded ${timeoutMs}ms")
      Option(events.get((appId, partition))).map {
        m => m.subMap(from, until).asScala.toSeq.map { case (k, v) => (k, v) }
      }.getOrElse(Seq.empty)
    }
  }
}

/** Discovery retry policy (app.py:261-302): poll until streams appear,
  * and after `randomizeAfter` consecutive empty results switch to a
  * randomized app id (`appId` + digits, app.py:30-35) — the reference's
  * workaround for a saturated app-id slot.
  */
object FalconDiscovery {
  case class Outcome(appId: String, streams: Seq[StreamDesc], attempts: Int)

  def discoverWithRetry(client: FalconClient, appId: String,
                        maxAttempts: Int, randomizeAfter: Int,
                        sleepMs: Long = 0L,
                        seed: Long = 42L): Outcome = {
    val rnd = new scala.util.Random(seed)
    var retires = 0
    var attempt = 0
    var lastId = appId
    while (attempt < maxAttempts) {
      // the reference policy exactly (app.py:271-279): the BASE id until
      // retires exceeds appid-random, then a FRESH random id per attempt
      // ("{appId}-{digits}" padded to 31 base chars, app.py:30-35);
      // appid-random 0 disables randomization entirely
      val currentId =
        if (randomizeAfter != 0 && retires > randomizeAfter) {
          val randLen = math.max(31 - appId.length, 1)
          appId + "-" + Seq.fill(randLen)(rnd.nextInt(10)).mkString
        } else appId
      lastId = currentId
      val found = client.discoverStreams(currentId)
      attempt += 1
      if (found.nonEmpty) return Outcome(currentId, found, attempt)
      retires += 1
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    Outcome(lastId, Seq.empty, attempt)
  }
}

class FalconTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"falcon(${properties.getOrElse("appId", "default")})"
  override def schema(): StructType = FalconSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FalconSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FalconMicroBatchStream(
            options.asScala.getOrElse("appId", "default"),
            streamTimeoutSec = options.asScala.getOrElse("streamTimeoutSec", "60").toInt,
            refreshRetrySec = options.asScala.getOrElse("refreshRetrySec", "30").toInt,
            maxRowsPerTrigger = options.asScala.get("maxRowsPerTrigger").map(_.toLong))
      }
    }
}

/** Offset = the reference's checkpoint file shape: partition → next
  * offset to request (resume-exclusive, app.py:146).
  */
case class FalconOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }.mkString("{", ", ", "}")
}

object FalconOffset {
  def parse(json: String): FalconOffset = FalconOffset(
    """"(\d+)":\s*(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

class FalconMicroBatchStream(appId: String, streamTimeoutSec: Int = 60,
                             refreshRetrySec: Int = 30,
                             maxRowsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow drain target: the per-partition heads captured
  // when the drain starts. Without this interface Spark falls back to
  // ONE giant batch for the whole backlog ("single batch execution"),
  // bypassing admission control and per-batch offset checkpointing —
  // exactly the two properties a bounded drain exists for. With it,
  // latestOffset never advances past the captured target (rows arriving
  // mid-drain wait for the next run) and each capped batch still
  // commits its own offsets.
  @volatile private var drainTarget: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val ds = descs
    drainTarget = Some(
      ds.map(d => d.partition -> client.latestOffset(appId, d.partition)).toMap)
  }
  private val client = new StubFalconServer.Client
  // session refresh cadence: the reference refreshes each partition's
  // session at 85% of the server-provided interval (app.py:256); the
  // deadline is PER PARTITION — a shared clock would let the first due
  // partition starve the rest forever
  private val lastRefreshMs = scala.collection.mutable.Map.empty[Int, Long]
  // every partition offset this stream has ever seen: discovery is
  // transiently fallible, and the reference's offset file never forgets a
  // partition (app.py:38-58) — without carry-forward, one empty discovery
  // tick would reset a reappearing partition to 0 and re-read its history
  private var knownOffsets = Map.empty[Int, Long]
  private def remember(o: FalconOffset): FalconOffset = synchronized {
    knownOffsets = knownOffsets ++ o.offsets
    FalconOffset(knownOffsets)
  }

  // last-seen session token per partition (like knownOffsets): a partition
  // missing from ONE discovery tick (transient blip at replan time) may
  // still have committed-but-unread rows; planning it with its last-known
  // token lets the batch proceed instead of failing on an empty credential.
  // In-memory by design — tokens rotate server-side, so persisting them
  // would replay stale credentials. A blip coinciding with a DRIVER
  // restart (fresh empty map) still fails that batch; Spark's batch retry
  // re-plans after the next discovery tick, which is the reference's
  // restart behavior too (get_streams on startup, app.py:306)
  private var knownTokens = Map.empty[Int, String]
  private def descs: Seq[StreamDesc] = {
    val ds = client.discoverStreams(appId)
    synchronized { knownTokens = knownTokens ++ ds.map(d => d.partition -> d.token) }
    ds
  }

  override def initialOffset(): Offset =
    remember(FalconOffset(descs.map(d => d.partition -> 0L).toMap))

  private def refreshTick(ds: Seq[StreamDesc]): Unit = {
    val now = System.currentTimeMillis()
    ds.foreach { d =>
      val due = lastRefreshMs.getOrElse(d.partition, 0L) + (d.refreshIntervalSec * 850L)
      if (now >= due) {
        if (client.refreshSession(appId, d.partition))
          lastRefreshMs(d.partition) = now
        else
          // a FAILED refresh retries after refreshRetrySec (app.py:186-190
          // schedules 30 s ahead), not after the full 85% interval
          lastRefreshMs(d.partition) =
            now - d.refreshIntervalSec * 850L + refreshRetrySec * 1000L
      }
    }
  }

  /** Live per-partition heads, clamped to the AvailableNow drain target
    * when one is set (partitions discovered mid-drain are excluded — the
    * drain processes what existed when it started).
    */
  private def liveHeads(ds: Seq[StreamDesc]): Map[Int, Long] = drainTarget match {
    case Some(t) => t
    case None => ds.map(d => d.partition -> client.latestOffset(appId, d.partition)).toMap
  }

  override def latestOffset(): Offset = {
    val ds = descs
    refreshTick(ds)
    remember(FalconOffset(liveHeads(ds)))
  }

  /** Admission control (`maxRowsPerTrigger`): cap each micro-batch's
    * advance so a stream resumed after downtime drains its backlog in
    * BOUNDED batches instead of one giant catch-up batch — the knob that
    * keeps executor memory and batch latency flat at any backlog size.
    * The row budget splits evenly across partitions (minimum 1 per
    * partition with data, so progress is always made).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ds = descs
    refreshTick(ds)
    val startMap = start.asInstanceOf[FalconOffset].offsets
    val live = liveHeads(ds)
    val capped = limit match {
      case r: ReadMaxRows if ds.nonEmpty =>
        // split the row budget across partitions WITH backlog only: with
        // one laggard among 4 idle partitions, the laggard gets the whole
        // budget instead of a quarter of it, so catch-up is 4× faster
        val lagging = live.count { case (p, head) => head > startMap.getOrElse(p, 0L) }
        val perPartition = math.max(r.maxRows() / math.max(lagging, 1), 1L)
        live.map { case (p, head) =>
          val from = startMap.getOrElse(p, 0L)
          p -> math.min(head, from + perPartition)
        }
      case _ => live
    }
    remember(FalconOffset(capped))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def deserializeOffset(json: String): Offset = {
    // feed carry-forward, but return the PARSED offset verbatim: this is
    // a committed batch boundary, and merging knownOffsets into it would
    // fast-forward a replayed batch's start past data the batch never
    // read (e.g. a new partition's backlog would be skipped silently)
    val o = FalconOffset.parse(json)
    remember(o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FalconOffset].offsets
    val e = end.asInstanceOf[FalconOffset].offsets
    // session tokens come from the CURRENT discovery (a refresh may have
    // rotated them), falling back to the last-seen token for a partition
    // absent from this tick — the committed end offset may still hold
    // pending rows for it, and an empty token would fail the whole batch
    val _ = descs   // refresh knownTokens with this tick's discovery
    val tokens = synchronized(knownTokens)
    e.toSeq.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from)
        Some(FalconInputPartition(appId, p, tokens.getOrElse(p, ""), from, until,
          streamTimeoutSec * 1000L))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
        new FalconPartitionReader(partition.asInstanceOf[FalconInputPartition])
    }

  override def commit(end: Offset): Unit = ()   // offset WAL handles durability
  override def stop(): Unit = ()
}

case class FalconInputPartition(appId: String, partition: Int, token: String,
                                from: Long, until: Long,
                                timeoutMs: Long) extends InputPartition

class FalconPartitionReader(p: FalconInputPartition)
    extends PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
  private val it = new StubFalconServer.Client()
    .fetch(p.appId, p.partition, p.token, p.from, p.until, p.timeoutMs).iterator
  private var current: (Long, String) = _

  override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
  override def get(): org.apache.spark.sql.catalyst.InternalRow =
    org.apache.spark.sql.catalyst.InternalRow(
      p.partition.toLong, current._1, UTF8String.fromString(current._2))
  override def close(): Unit = ()
}
