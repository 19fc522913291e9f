package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

/** End-to-end drive of the streaming connector on a REAL file source:
  * synthesizes Falcon-style envelope NDJSON from the events fixture
  * (plus some corrupt lines), streams it through the full pipeline into
  * a counting bulk sink with checkpointing, and prints what got shipped.
  *
  * `sbt "runMain graft.streaming.StreamDemo"` — prints SHIPPED=n DROPPED=m.
  */
object StreamDemo {

  class CountingSink extends ConnectorPipeline.BulkSink {
    override def post(events: Seq[String]): Boolean = {
      StreamDemo.shipped.addAndGet(events.size); true
    }
  }
  val shipped = new AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Synthesize envelope lines from the fixture: event_id plays offset,
    // ts plays eventCreationTime (SURVEY §1.4 mapping), plus corrupt lines.
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val n = Tables.events(spark, sfDir).limit(500)
      .select(to_json(struct(
        struct(col("event_type").as("eventType"),
          col("event_id").as("offset"),
          unix_millis(col("ts")).as("eventCreationTime")).as("metadata"),
        struct(col("props").as("OperationName")).as("event"))).as("value"))
      .union(spark.range(25).select(concat(lit("{corrupt line "), col("id")).as("value")))
    n.coalesce(1).write.mode("overwrite").text(srcDir)
    val total = 525L

    val cp = Files.createTempDirectory("graft-stream-cp").toString
    val lines = spark.readStream.text(srcDir)
    val q = ConnectorPipeline.run(lines, new CountingSink, cp,
      host = "demo-host", streamId = "graft-demo",
      triggerMs = 200L, bulkMaxSize = 100)
    q.processAllAvailable()
    q.stop()
    println(s"SHIPPED=${shipped.get} DROPPED=${total - shipped.get} (expect 500/25)")
    require(shipped.get == 500L, "all valid events must ship; corrupt lines drop")

    // Phase 2: the same pipeline fed by the Falcon-protocol DSv2 source
    // (discovery → partitioned offset reads → checkpointed resume),
    // against the in-JVM stub server.
    import graft.sources.{StreamDesc, StubFalconServer, FalconTableProvider}
    StubFalconServer.reset()
    StubFalconServer.register("demo", Seq(StreamDesc(0, 1800), StreamDesc(1, 1800)))
    (0L until 120L).foreach { o =>
      val p = (o % 2).toInt
      StubFalconServer.push("demo", p, o,
        s"""{"metadata": {"offset": $o, "eventCreationTime": ${1648464000000L + o}, "eventType": "T"}, "event": {"UserId": "u$p"}}""")
    }
    shipped.set(0)
    val cp2 = Files.createTempDirectory("graft-falcon-cp").toString
    val falconLines = spark.readStream
      .format(classOf[FalconTableProvider].getName)
      .option("appId", "demo").load()
      .select(col("value"))
    // the supervised form (R15): restart-on-failure with checkpoint resume
    val supervised = Supervisor.run(
      start = () => ConnectorPipeline.run(falconLines, new CountingSink, cp2,
        host = "demo-host", streamId = "falcon-demo",
        triggerMs = 200L, bulkMaxSize = 50),
      drain = q => { q.processAllAvailable(); q.stop() },
      maxRestarts = 2)
    println(s"FALCON_SHIPPED=${shipped.get} REFRESH_CALLS=${StubFalconServer.refreshCalls.get} " +
      s"RESTARTS=${supervised.restarts} (expect 120/>=1/0)")
    require(shipped.get == 120L, "all stub-server events must flow through the DSv2 source")
    spark.stop()
  }
}
