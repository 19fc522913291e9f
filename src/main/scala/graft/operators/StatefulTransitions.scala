package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming twin of [[LogAnalytics.transitions]] — live (from, to)
  * event-pair emission: per key, every event after the first emits one
  * transition row from its predecessor in event-time order. Downstream
  * aggregation (the transition matrix) is an ordinary streaming
  * groupBy over the emitted pairs.
  *
  * State per key is ONE (ts-millis, event_id, event_type) triple — the
  * last event seen — so state size is independent of traffic. Rows
  * within a micro-batch sort by (ts, event_id) before pairing (Spark
  * guarantees no intra-group order); across batches the stored last
  * event chains the sequence, so on in-order (or drained in-order)
  * arrival the emitted pair multiset equals the batch lead() window —
  * proven in HumioStreamSpec. Late events that would re-order an
  * already-consumed predecessor cannot retract (append mode); the
  * watermark bounds the divergence exactly as in the other twins.
  * State expires once the watermark passes the stored event time — an
  * expiry-then-late-arrival restarts the chain (no pair across the
  * gap), the same documented watermark trade.
  */
object StatefulTransitions {
  case class LastEvent(tMs: Long, eid: Long, typ: String)

  /** `df` must carry `ts`, `event_type`, a non-null LONG `keyCol`, and
    * optionally `event_id`. Output: (k, from_type, to_type, t_ms)
    * append rows, t_ms = the destination event's time.
    */
  def pairs(df: DataFrame, keyCol: String): DataFrame = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex("ts")
    val typeIdx = schema.fieldIndex("event_type")
    val eidIdx = schema.fieldNames.indexOf("event_id")
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("from_type", StringType, nullable = false),
      StructField("to_type", StringType, nullable = false),
      StructField("t_ms", LongType, nullable = false)))
    df.where(col(keyCol).isNotNull)
      .groupByKey((r: Row) => r.getLong(keyIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEvent, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, rows: Iterator[Row], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = rows.toVector
              .filter(r => !r.isNullAt(tsIdx) && !r.isNullAt(typeIdx))
              .map { r =>
                val t = r.getAs[java.sql.Timestamp](tsIdx).getTime
                val e = if (eidIdx >= 0 && !r.isNullAt(eidIdx))
                  r.getLong(eidIdx) else 0L
                LastEvent(t, e, r.getString(typeIdx))
              }
              .sortBy(e => (e.tMs, e.eid))
            if (ordered.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val chain = prev.toVector ++ ordered
              val out = chain.sliding(2).collect {
                case Vector(a, b) => Row(k, a.typ, b.typ, b.tMs)
              }.toVector
              val last = chain.last
              state.update(last)
              state.setTimeoutTimestamp(
                math.max(last.tMs, state.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }(Encoders.product[LastEvent], Encoders.row(outSchema))
  }
}
