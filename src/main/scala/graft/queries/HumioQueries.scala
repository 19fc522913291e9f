package graft.queries

import graft.Tables
import graft.query.HumioQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipe-language queries compiled by [[graft.query.HumioQuery]] and
  * checked against plain-SQL oracles — a differential proof that the
  * compiler's filters/aggregations/buckets mean what the SQL means.
  */
object HumioQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  def hqFilter(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "value > 450.0 | select(event_id, event_type) | sort(event_id)")

  def hqGroup(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type != error | groupBy(event_type) | sort(event_type)")

  def hqWildcard(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = c* | groupBy(event_type) | sort(event_type)")

  /** extract + typed filter on the promoted field — R3's parse surfaced
    * as a pipe stage.
    */
  def hqExtract(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "extract(props, k) | k >= 95 | select(event_id, k) | sort(event_id)")

  /** regex filter over event_type. */
  def hqRegex(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "event_type = /^(click|view)$/ | groupBy(event_type) | sort(event_type)")

  def hqTimechart(s: SparkSession, dir: String): DataFrame =
    HumioQuery.run(ev(s, dir),
      "timechart(event_type, span=6h) | sort(_bucket_ms, event_type)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hq_filter"    -> hqFilter _,
    "hq_group"     -> hqGroup _,
    "hq_wildcard"  -> hqWildcard _,
    "hq_extract"   -> hqExtract _,
    "hq_regex"     -> hqRegex _,
    "hq_timechart" -> hqTimechart _)

  val oracle: Map[String, String] = Map(
    "hq_filter" ->
      """SELECT event_id, event_type FROM events
        |WHERE value > 450.0 ORDER BY event_id""".stripMargin,
    "hq_group" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_wildcard" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE event_type LIKE 'c%'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_extract" ->
      """SELECT event_id, props->>'$.k' AS k FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) >= 95
        |ORDER BY event_id""".stripMargin,
    "hq_regex" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events WHERE regexp_matches(event_type, '^(click|view)$')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "hq_timechart" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 21600000) * 21600000 AS _bucket_ms,
        |       event_type, CAST(count(*) AS BIGINT) AS _count
        |FROM events GROUP BY 1, 2 ORDER BY _bucket_ms, event_type""".stripMargin)
}
