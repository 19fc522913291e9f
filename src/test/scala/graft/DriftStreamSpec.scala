package graft

import graft.operators.Drift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming drift monitor ([[Drift.streamingDriftState]] +
  * [[Drift.finishDrift]]) against its batch twin: per-window KL/TV on
  * a drained stream must equal the batch scores of the same docs, and
  * at-least-once redelivery must not move the state (the first()-keyed
  * windowed aggregate collapses a re-sent doc onto its own key).
  * The reference corpus deliberately EXCLUDES some stream words so the
  * OOV lump path is exercised (fixture docs can't — they share one
  * vocabulary).
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00")

  // reference snapshot: a skewed word distribution; "drifted" and
  // "novel" never appear here → they must land in the OOV bin
  private val refDocs = Seq(
    "alpha alpha alpha beta beta gamma",
    "alpha beta gamma delta delta",
    "alpha gamma epsilon")
  private val ref = Drift.refBinsFromCounts(
    refDocs.toDF("text")
      .select(explode(split(col("text"), " ")).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c")))

  // two 10-minute windows; window 2 drifts hard (novel mass)
  private val batch1 = Seq(
    (ts(1), 1L, "alpha alpha beta gamma"),
    (ts(3), 2L, "alpha beta delta"),
    (ts(12), 3L, "drifted novel novel epsilon"))
  private val batch2 = Seq(
    (ts(5), 4L, "gamma gamma alpha"),
    (ts(14), 5L, "novel drifted drifted"))

  private def batchScores(rows: Seq[(java.sql.Timestamp, Long, String)]): Seq[Row] = {
    val state = rows.toDF("ts", "doc_id", "text")
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("doc_id").as("id"))
      .agg(first(split(col("text"), " ")).as("items"))
    collect(Drift.finishDrift(state, ref))
  }

  private type Row = (Long, Long, Double, Double, Double)
  private def collect(df: DataFrame): Seq[Row] =
    df.select("wstart", "n0", "kl_wr", "kl_rw", "tv")
      .orderBy("wstart").as[Row].collect().toSeq

  test("drained streaming drift state scores equal the batch twin, redelivery is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = Drift.streamingDriftState(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", split(col("text"), " "), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("drift_state")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      def scores() = collect(Drift.finishDrift(spark.table("drift_state"), ref))
      assert(scores() == batchScores(batch1),
        "drained state must score exactly like the batch twin")
      // at-least-once redelivery: same docs re-sent → same keys, same
      // first() payloads → state (and therefore scores) unchanged
      mem.addData(batch1: _*)
      q.processAllAvailable()
      assert(scores() == batchScores(batch1), "redelivery must not move the state")
      mem.addData(batch2: _*)
      q.processAllAvailable()
      assert(scores() == batchScores(batch1 ++ batch2),
        "late-arriving docs must merge into their windows")
    } finally q.stop()
  }

  test("OOV lump and drift direction: the novel-mass window scores higher") {
    val s = batchScores(batch1 ++ batch2)
    assert(s.size == 2, s"expected two windows: $s")
    val (w1, w2) = (s.head, s.last)
    // window 2 is mostly words the reference never saw → larger drift
    // on every axis
    assert(w2._3 > w1._3 && w2._4 > w1._4 && w2._5 > w1._5,
      s"novel-mass window must out-drift the in-vocabulary one: $s")
    // OOV really is the lump: scoring with a reference whose head
    // contains the novel words (built FROM the stream docs) must
    // strictly reduce window-2 drift
    val selfRef = Drift.refBinsFromCounts(
      (batch1 ++ batch2).map(_._3).toDF("text")
        .select(explode(split(col("text"), " ")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c")))
    val s2 = batchScores(batch1 ++ batch2) // same counts…
    val drifted = collect(Drift.finishDrift(
      (batch1 ++ batch2).toDF("ts", "doc_id", "text")
        .groupBy(window(col("ts"), "10 minutes").as("win"), col("doc_id").as("id"))
        .agg(first(split(col("text"), " ")).as("items")), selfRef))
    assert(drifted.last._3 < s2.last._3,
      "a reference that knows the novel words must report less drift")
  }

  test("edge inputs: OOV-only window and an empty reference never throw") {
    // every stream word unknown to the reference → all mass in the OOV
    // bin; smoothing keeps both KLs finite and TV sane
    val oovOnly = Seq((ts(2), 9L, "zz yy xx ww"))
    val s1 = batchScores(oovOnly)
    assert(s1.size == 1 && s1.head._2 == 4L, s"4 grams, one window: $s1")
    assert(s1.head._3 > 0 && s1.head._4 > 0 && s1.head._5 > 0 && s1.head._5 <= 1,
      s"finite positive drift on an all-OOV window: $s1")
    // an EMPTY reference corpus: head empty, OOV row carries 0 mass —
    // v = 1, n1 = 0; add-one smoothing keeps every ln argument >= 1
    // and the (n1 + v) denominators >= 1 (no ANSI divide-by-zero)
    val emptyRef = Drift.refBinsFromCounts(
      Seq.empty[(String, Long)].toDF("bin", "c"))
    assert(emptyRef.as[(String, Long)].collect().toSeq == Seq((Drift.OOV, 0L)))
    val state = oovOnly.toDF("ts", "doc_id", "text")
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("doc_id").as("id"))
      .agg(first(split(col("text"), " ")).as("items"))
    val out = collect(Drift.finishDrift(state, emptyRef))
    assert(out.size == 1 && out.head._2 == 4L, s"scores exist: $out")
  }

  test("refBinsFromCounts: head keeps exact counts, OOV lumps the tail mass") {
    val counts = Seq(("a", 50L), ("b", 30L), ("c", 2L)).toDF("bin", "c")
    val bins = Drift.refBinsFromCounts(counts)
      .as[(String, Long)].collect().toMap
    // REF_K is far above 3, so the head holds all three and OOV is 0
    assert(bins == Map("a" -> 50L, "b" -> 30L, "c" -> 2L, Drift.OOV -> 0L))
  }
}
