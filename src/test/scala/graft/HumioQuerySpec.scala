package graft

import graft.query.HumioQuery
import org.apache.spark.sql.functions._

class HumioQuerySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "click", 10.0, 100L), (2L, "view", 20.0, 200L),
    (3L, "click", 30.0, 300L), (4L, "error", 40.0, 400L))
    .toDF("event_id", "event_type", "value", "user_id")

  test("filter + select + sort") {
    val out = HumioQuery.run(df, "value >= 20.0 | select(event_id) | sort(event_id, order=desc)")
      .as[Long].collect().toSeq
    assert(out == Seq(4L, 3L, 2L))
  }

  test("equality, inequality, wildcard filters") {
    assert(HumioQuery.run(df, "event_type = click").count() == 2)
    assert(HumioQuery.run(df, "event_type != click").count() == 2)
    assert(HumioQuery.run(df, "event_type = c*").count() == 2)
    assert(HumioQuery.run(df, "event_type = *i*").count() == 3)
    assert(HumioQuery.run(df, """event_type = "click"""").count() == 2)
  }

  test("groupBy with aggregate functions") {
    val counts = HumioQuery.run(df, "groupBy(event_type) | sort(event_type)")
      .as[(String, Long)].collect().toSeq
    assert(counts == Seq(("click", 2L), ("error", 1L), ("view", 1L)))
    val sums = HumioQuery.run(df, "groupBy(event_type, function=sum(value)) | sort(event_type)")
      .as[(String, Double)].collect().toMap
    assert(sums("click") == 40.0)
  }

  test("head limits") {
    assert(HumioQuery.run(df, "sort(event_id) | head(2)").count() == 2)
  }

  test("chained pipeline matches hand-built DataFrame") {
    val dsl = HumioQuery.run(df,
      "event_type != error | groupBy(user_id, function=max(value)) | sort(user_id)")
      .as[(Long, Double)].collect().toSeq
    val hand = df.where(col("event_type") =!= "error")
      .groupBy("user_id").agg(max("value")).orderBy("user_id")
      .as[(Long, Double)].collect().toSeq
    assert(dsl == hand)
  }

  test("regex filter, free-text search, json extract") {
    val d = Seq(
      (1L, "click", """{"k": 9}"""), (2L, "view", """{"k": 99}"""),
      (3L, "error", "not json"))
      .toDF("event_id", "event_type", "props")
    assert(HumioQuery.run(d, "event_type = /^(click|view)$/").count() == 2)
    // top-level alternation: the '|' inside /…/ must not split the pipe
    assert(HumioQuery.run(d, "event_type = /click|view/ | head(10)").count() == 2)
    // a plain slash in a value must NOT open a regex
    assert(HumioQuery.run(d.withColumn("p", lit("a/b")), "p = a/b | head(10)").count() == 3)
    assert(HumioQuery.run(d, "search(json)").count() == 1)  // only "not json" contains it
    assert(HumioQuery.run(d, "search(k)").count() == 2)     // {"k":...} rows; "error"/"not json" lack k
    assert(HumioQuery.run(d, "search(nothere)").count() == 0)
    val ks = HumioQuery.run(d, "extract(props, k) | select(event_id, k) | sort(event_id)")
      .as[(Long, Option[String])].collect().toSeq
    assert(ks == Seq((1L, Some("9")), (2L, Some("99")), (3L, None)),
      "corrupt JSON extracts to null, not failure")
  }

  test("the pipe language runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "event_type")
    // same compiler, streaming input: timechart becomes a streaming agg
    val out = HumioQuery.run(stream, "event_type != error | timechart(event_type, span=1h)")
    val q = out.writeStream.format("memory").queryName("dslstream")
      .outputMode("complete").trigger(Trigger.ProcessingTime(50L)).start()
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    mem.addData((t(0), "click"), (t(5), "click"), (t(10), "error"))
    q.processAllAvailable()
    val rows = spark.sql("select event_type, _count from dslstream")
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(rows == Map("click" -> 2L), "error filtered; clicks bucketed")
  }

  test("bad stage errors name the stage") {
    val e = intercept[IllegalArgumentException] {
      HumioQuery.run(df, "frobnicate(3)")
    }
    assert(e.getMessage.contains("frobnicate"))
  }
}
