package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 200L, 12L), (2L, 50L, 13L))
    .toDF("k", "ts", "id")
  // right rows at ts 100 and 200 for key 1
  private val right = Seq(
    (1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0))
    .toDF("k", "ts", "id", "v")

  test("asof strict: a row at the same (ts, tie) does NOT match itself") {
    val out = Relational.asofJoin(left, right, "k",
        col("ts"), col("ts"), col("id"), col("id"),
        Seq("id"), col("v"), strict = true)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).isEmpty, "first event has nothing strictly before it")
    assert(out(11L).contains(1.0), "same (ts,id) right row excluded; previous one matches")
    assert(out(12L).contains(2.0), "later tiebreak sees the (200,11) right row")
    assert(out(13L).isEmpty, "different key never matches")
  }

  test("band join: exact window edges, zero-match rows survive, no nested loop") {
    // right rows planted exactly ON and just past the ±500 ms band edges
    val lSrc = Seq((1L, 1000L), (2L, 2000L), (3L, 500000L)).toDF("id", "t")
    val rSrc = Seq(500L, 1500L, 1501L, 2000L, 2499L, 2501L).toDF("t")
    val joined = Relational.bandJoinBinned(
      lSrc, col("t"), rSrc, col("t"), 500L, Seq("id"))
    val counts = joined.groupBy("id")
      .agg(count(col("rts")).as("n")).as[(Long, Long)].collect().toMap
    // id 1 (t=1000): matches 500 (|Δ|=500, inclusive) and 1500; not 1501
    assert(counts(1L) == 2L, s"edge-inclusive band around 1000: $counts")
    // id 2 (t=2000): matches 1500, 2000, 2499; not 1501? |2000-1501|=499 → matches!
    assert(counts(2L) == 4L, s"band around 2000: $counts")
    // id 3: nothing within 500 ms → survives with zero
    assert(counts(3L) == 0L, "zero-match left row must survive the left-outer")

    // plan shape: equi-join on bin, never a nested loop / cartesian
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "band join must plan as an equi-join on the bin key")
  }

  test("asof inclusive: a row at the same (ts, tie) matches itself") {
    val out = Relational.asofJoin(left, right, "k",
        col("ts"), col("ts"), col("id"), col("id"),
        Seq("id"), col("v"), strict = false)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).contains(1.0))
    assert(out(11L).contains(2.0))
    assert(out(12L).contains(2.0))
  }
}
