package graft

import graft.operators.Connector
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property: the KV-array flatten equals a last-wins Scala Map fold for
  * arbitrary key/value lists including duplicate keys (SURVEY §5.2.3).
  * Seeded random cases (the pre-warmed cache has no scalatest/scalacheck
  * bridge artifact, so the generator loop is hand-rolled).
  */
class FlattenPropertySpec extends SparkSpec {
  import spark.implicits._

  test("kvFlatten == last-wins map fold, for random duplicate-keyed lists") {
    Connector.lastWinPolicy(spark)
    val rnd = new Random(42)
    val keys = Seq("a", "b", "c")
    val cases = (1 to 40).map { _ =>
      List.fill(1 + rnd.nextInt(6))(
        (keys(rnd.nextInt(keys.size)), rnd.alphanumeric.take(5).mkString))
    }
    // single Spark job for all cases — one row each
    val df = cases.toDF("kv")
      .select(Connector.kvFlatten(
        transform(col("kv"), e => struct(e("_1").as("Key"), e("_2").as("ValueString"))))
        .as("m"))
    val got = df.as[Map[String, String]].collect()
    cases.zip(got).foreach { case (kvs, m) =>
      val expected = kvs.foldLeft(Map.empty[String, String])(_ + _)
      assert(m == expected, s"for input $kvs")
    }
  }

  test("dedup keep-first is idempotent (random inputs)") {
    val rnd = new Random(7)
    val rows = (1 to 200).map(i =>
      (rnd.nextInt(10).toLong, s"t${rnd.nextInt(3)}",
        new java.sql.Timestamp(rnd.nextInt(100000).toLong), i.toLong))
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    import graft.operators.LogAnalytics
    val keys = Seq(col("user_id"), col("event_type"))
    val ord = Seq(col("ts"), col("event_id"))
    val once = LogAnalytics.dedupKeepFirst(df, keys, ord)
    val twice = LogAnalytics.dedupKeepFirst(once, keys, ord)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).isEmpty)
  }
}
