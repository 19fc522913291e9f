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
