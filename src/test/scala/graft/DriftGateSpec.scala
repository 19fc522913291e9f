package graft

import graft.operators.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The drift→ACTION composition ([[Drift.driftVerdicts]] +
  * [[Drift.gateDrained]]): a window whose KL is a 2σ outlier against
  * its peers quarantines as a whole — every in-flight doc of that
  * window routes out, clean windows pass — and at-least-once
  * redelivery must not move the verdicts (the state is the
  * first()-keyed windowed aggregate of DriftStreamSpec; the gate is
  * stateless over the bounded drained drift relation). Batch face:
  * `x_drift_gate` (LogQueries), hash-gated against DuckDB.
  */
class DriftGateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  // reference: the clean vocabulary; "poison"/"venom" never appear
  private val ref = Drift.refBinsFromCounts(
    Seq("alpha alpha beta gamma", "alpha beta delta", "gamma delta")
      .toDF("text")
      .select(explode(split(col("text"), " ")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c")))

  // seven 10-minute windows: six echo the reference mix, window 4
  // (minutes 40-49) is pure novel mass
  private val docs: Seq[(java.sql.Timestamp, Long, String)] =
    (0 until 7).flatMap { w =>
      if (w == 4) Seq(
        (ts(w * 10 + 1), w * 10L + 1, "poison venom poison"),
        (ts(w * 10 + 5), w * 10L + 2, "venom venom poison"))
      else Seq(
        (ts(w * 10 + 2), w * 10L + 1, "alpha alpha beta gamma"),
        (ts(w * 10 + 7), w * 10L + 2, "alpha beta delta gamma"))
    }

  private def state(rows: Seq[(java.sql.Timestamp, Long, String)]): DataFrame =
    rows.toDF("ts", "doc_id", "text")
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("doc_id").as("id"))
      .agg(first(split(col("text"), " ")).as("items"))

  private def verdicts(st: DataFrame): Map[Long, (Long, Long)] =
    Drift.gateDrained(st, ref)
      .select("wstart", "id", "quarantined")
      .as[(Long, Long, Long)].collect()
      .map { case (w, id, q) => id -> ((w, q)) }.toMap

  test("a poisoned window quarantines whole; clean windows pass") {
    val v = verdicts(state(docs))
    assert(v.size == docs.size, "every in-flight doc gets a verdict row")
    val poisoned = docs.filter(_._3.contains("poison")).map(_._2).toSet
    poisoned.foreach(id => assert(v(id)._2 == 1L,
      s"doc $id of the novel-mass window must quarantine: $v"))
    (v.keySet -- poisoned).foreach(id => assert(v(id)._2 == 0L,
      s"clean-window doc $id must pass: $v"))
  }

  test("all-alike windows quarantine nothing (d = 0 degenerate)") {
    val clean = docs.filterNot(_._3.contains("poison"))
    val v = verdicts(state(clean))
    assert(v.nonEmpty && v.values.forall(_._2 == 0L),
      s"identical windows have zero variance and no outlier: $v")
  }

  test("streaming state gates like the batch twin, redelivery is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Drift.streamingDriftState(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", split(col("text"), " "), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("drift_gate_state")
      .outputMode("complete").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val want = verdicts(state(docs))
      assert(verdicts(spark.table("drift_gate_state")) == want,
        "drained streaming state must gate exactly like the batch twin")
      // at-least-once redelivery: same docs re-sent collapse on the
      // (window, doc) key with identical first() payloads
      mem.addData(docs: _*)
      q.processAllAvailable()
      assert(verdicts(spark.table("drift_gate_state")) == want,
        "redelivery must not move the verdicts")
    } finally q.stop()
  }
}
