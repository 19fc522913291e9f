package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Streaming twin of the DSL's `counterAsRate()` — per-series
  * Δcounter/Δsec over an UNBOUNDED stream, where the batch plan's lag
  * window cannot run (no finished table to order). The per-series "last
  * event" is explicit state in `flatMapGroupsWithState`: two numbers and
  * a null flag per series (~tens of bytes), so a million series cost
  * megabytes of state store — the 100 TB shape, vs. a shuffle-and-sort
  * that can never complete on an unbounded input.
  *
  * Semantics vs. the batch verb (HumioQuery `counterAsRate`, which the
  * reference delegates to LogScale): identical — NULL for a series'
  * first event, counter resets (negative delta), zero time deltas, and
  * null counter values (a null poisons the NEXT delta too, exactly like
  * `lag()`) — WHEN each series' events arrive in event-time order
  * across micro-batches. Within one micro-batch arrival order doesn't
  * matter (rows are sorted by (ts, event_id) before folding). A row
  * arriving BEHIND its series' state (event-time order broken across
  * batches) gets a NULL rate and leaves state untouched: its true
  * predecessor is unknowable without unbounded buffering, and silently
  * rating it against a LATER event would fabricate a negative-dt rate.
  * This is the same bounded-state trade the watermark makes for
  * aggregations, applied to sequence state.
  *
  * A NULL-ts row rates NULL and leaves state untouched (it has no
  * event-time position). One documented divergence from batch: there,
  * a null ts sorts first within its series and poisons the FOLLOWING
  * row's dt; here it is inert — the streaming fold cannot give an
  * unordered row a stable successor.
  *
  * State never expires (`NoTimeout`): the connector's series keys (aid,
  * event type) are low-cardinality and long-lived. A deployment with
  * unbounded ephemeral series would add `EventTimeTimeout` and accept
  * that a series resuming after the timeout restarts from NULL.
  */
object StatefulRate {
  /** Last event seen per series: event-time millis, the (ts, event_id)
    * tiebreak id, counter value, and whether the counter was null (a
    * null must poison the next delta, exactly as `lag()` does in the
    * batch plan). `eid` makes the cross-batch ordering match the batch
    * window's (ts, event_id) order for same-millisecond events: without
    * it, a same-ts row landing in a LATER micro-batch would overwrite
    * state out of tiebreak order and fabricate a wrong (non-NULL) rate
    * for the next event. */
  case class SeriesLast(ts: Long, eid: Long, value: Double, valueNull: Boolean)

  /** Append `outCol` (nullable double) to a STREAMING `df`: the
    * per-`by`-series counter rate of `field` in (ts, event_id) event-time
    * order. `df` must carry a `ts` timestamp column; `event_id` is used
    * as the within-millisecond tiebreak when present.
    */
  def counterRate(df: DataFrame, field: String, by: String, outCol: String): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(schema.fields :+
      StructField(outCol, DoubleType, nullable = true))
    val tsIdx = schema.fieldIndex("ts")
    val fIdx = schema.fieldIndex(field)
    val byIdx = schema.fieldIndex(by)
    val eidIdx = schema.fieldNames.indexOf("event_id")
    def num(r: Row, i: Int): Double = r.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case x => x.toString.toDouble
    }
    df.groupByKey { r: Row =>
        // NUL prefix keeps a null series key distinct from the string "null"
        if (r.isNullAt(byIdx)) "\u0000" else "v" + String.valueOf(r.get(byIdx))
      }(Encoders.STRING)
      .flatMapGroupsWithState[SeriesLast, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[SeriesLast]) =>
          def eidOf(r: Row): Long =
            if (eidIdx >= 0 && !r.isNullAt(eidIdx)) r.get(eidIdx) match {
              case n: java.lang.Number => n.longValue()
              case _ => 0L
            } else 0L
          // one micro-batch of one series: bounded, so the sort is safe —
          // and required, Spark guarantees no intra-group order. A NULL
          // ts row has no place in event-time order: it sorts first and
          // the fold below gives it a NULL rate without touching state
          // (the batch window would also rate it NULL; its next-row
          // poisoning there is the one divergence, documented above).
          val ordered = rows.toVector.sortBy { r =>
            (!r.isNullAt(tsIdx), // nulls first, like the batch sort
              if (r.isNullAt(tsIdx)) 0L
              else r.getAs[java.sql.Timestamp](tsIdx).getTime,
              eidOf(r))
          }
          var last = state.getOption
          val out = ordered.map { r =>
            if (r.isNullAt(tsIdx)) Row.fromSeq(r.toSeq :+ null)
            else {
              val t = r.getAs[java.sql.Timestamp](tsIdx).getTime
              val e = eidOf(r)
              // "behind" = before the state in (ts, event_id) order —
              // the cross-batch out-of-order case
              val behind = last.exists(p => t < p.ts || (t == p.ts && e < p.eid))
              val vNull = r.isNullAt(fIdx)
              val v = if (vNull) 0.0 else num(r, fIdx)
              val rate: Any = last match {
                case Some(_) if behind => null // order broken across batches
                case Some(p) =>
                  val d = v - p.value
                  if (vNull || p.valueNull || t == p.ts || d < 0) null
                  else d / ((t - p.ts).toDouble / 1000.0)
                case None => null // series' first event
              }
              if (!behind) last = Some(SeriesLast(t, e, v, vNull))
              Row.fromSeq(r.toSeq :+ rate)
            }
          }
          last.foreach(state.update)
          out.iterator
      }(Encoders.product[SeriesLast], Encoders.row(outSchema))
  }
}
