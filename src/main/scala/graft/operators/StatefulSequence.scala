package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming twins of the DSL sequence functions (accumulate /
  * slidingWindow / neighbor) — per-key running, last-n-event, and lag
  * values emitted live on every event.
  *
  * Discipline (the [[StatefulTransitions]] contract): state per key is
  * O(1) for the running aggregate and O(n)/O(distance) for the ring —
  * independent of traffic; rows within a micro-batch sort by
  * (ts, event_id) before consuming (Spark guarantees no intra-group
  * order), across batches the stored state chains the sequence, so on
  * in-order (or drained in-order) arrival the emitted values equal the
  * batch window row-for-row — proven in HumioStreamSpec. A late event
  * that would re-order an already-consumed predecessor folds in at
  * arrival position (append mode cannot retract); the watermark bounds
  * the divergence exactly as in the other twins, and state expires once
  * it passes the stored event time. At-least-once redelivery would
  * double-count a running SUM — compose `dedup(event_id) | accumulate`
  * upstream (dropDuplicatesWithinWatermark) when the source redelivers,
  * the same layering the connector sink documents.
  *
  * Values are LONG (the batch twins' exact-integer discipline: quantize
  * floats to cents/2^20 upstream — a float running sum would drift with
  * association order and could never hash-match its batch twin).
  */
object StatefulSequence {

  /** Running-aggregate state: contribution count + the accumulator
    * (sum/min/max fold; count uses `n` alone) + last-seen (ts, eid)
    * for the timeout clock. */
  case class AccState(tMs: Long, eid: Long, n: Long, acc: Long)

  /** Ring state for slidingWindow/neighbor: the last `cap` values in
    * sequence order; None = a row whose value was NULL (lag counts
    * rows, not non-null values — the batch frame does too). */
  case class RingState(tMs: Long, eid: Long, vs: Seq[Option[Long]])

  private def prep(df: DataFrame, keyCol: String, valueCol: String) = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex("ts")
    val eidIdx = schema.fieldNames.indexOf("event_id")
    val keyIdx = schema.fieldIndex(keyCol)
    val vIdx = schema.fieldIndex(valueCol)
    require(schema(vIdx).dataType == LongType,
      s"streaming sequence stages need a LONG value column (got " +
        s"${schema(vIdx).dataType.simpleString} for '$valueCol') — " +
        "quantize to exact integers first (cents := round(x * 100))")
    (schema, tsIdx, eidIdx, keyIdx, vIdx)
  }

  private def orderedRows(rows: Iterator[Row], tsIdx: Int, eidIdx: Int) =
    rows.toVector
      .filter(r => !r.isNullAt(tsIdx))
      .sortBy { r =>
        (r.getAs[java.sql.Timestamp](tsIdx).getTime,
          if (eidIdx >= 0 && !r.isNullAt(eidIdx)) r.getLong(eidIdx) else 0L)
      }

  // key by the column's string form: works for any key type (the
  // null-key rows are filtered before grouping, so no sentinel needed —
  // unlike StatefulDedup's nullable keys)
  private def rowKeyFn(keyIdx: Int): Row => String =
    r => String.valueOf(r.get(keyIdx))

  /** Running aggregate per key: every event emits its input columns plus
    * `outCol` = fn over every value seen so far for the key (in
    * consumption order). fn ∈ sum | count | min | max; NULL values
    * contribute nothing (sum/min/max emit NULL until the first non-null,
    * count emits 0 — the batch frame conventions).
    */
  def running(df: DataFrame, keyCol: String, valueCol: String,
              fn: String, outCol: String): DataFrame = {
    require(Set("sum", "count", "min", "max")(fn),
      s"streaming accumulate supports sum|count|min|max, got '$fn' — a " +
        "running float avg would be association-order-dependent; derive " +
        "it from a running sum and count instead")
    val (schema, tsIdx, eidIdx, keyIdx, vIdx) = prep(df, keyCol, valueCol)
    val outSchema = schema.add(outCol, LongType, nullable = true)
    df.where(col(keyCol).isNotNull)
      .groupByKey(rowKeyFn(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[AccState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[AccState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = orderedRows(rows, tsIdx, eidIdx)
            if (ordered.isEmpty) Iterator.empty
            else {
              var st = state.getOption.getOrElse(AccState(0L, 0L, 0L, 0L))
              val out = ordered.map { r =>
                if (!r.isNullAt(vIdx)) {
                  val v = r.getLong(vIdx)
                  val acc = fn match {
                    case "sum"   => st.acc + v
                    case "count" => 0L
                    case "min"   => if (st.n == 0) v else math.min(st.acc, v)
                    case "max"   => if (st.n == 0) v else math.max(st.acc, v)
                  }
                  st = st.copy(n = st.n + 1, acc = acc)
                }
                val emit: Any = fn match {
                  case "count" => st.n
                  case _       => if (st.n == 0) null else st.acc
                }
                Row.fromSeq(r.toSeq :+ emit)
              }
              val last = ordered.last
              st = st.copy(
                tMs = last.getAs[java.sql.Timestamp](tsIdx).getTime,
                eid = if (eidIdx >= 0 && !last.isNullAt(eidIdx))
                  last.getLong(eidIdx) else 0L)
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.tMs, state.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }(Encoders.product[AccState], Encoders.row(outSchema))
  }

  /** partition() state: the previous event's value in string form
    * (None = the previous value was NULL) + the running 1-based
    * sub-sequence index; idx == 0 means no event seen yet. */
  case class PartState(tMs: Long, eid: Long, lastVal: Option[String],
                       idx: Long)

  /** Streaming partition(): 1-based sub-sequence index per key,
    * incremented whenever the value changes from the previous event
    * (null-safe: NULL→v and v→NULL are changes, NULL→NULL is not) —
    * the change() comparison runs on the value's string form, so any
    * column type keys the change detection (the index, not the value,
    * is what's emitted).
    */
  def partitionIdx(df: DataFrame, keyCol: String, valueCol: String,
                   outCol: String): DataFrame = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex("ts")
    val eidIdx = schema.fieldNames.indexOf("event_id")
    val keyIdx = schema.fieldIndex(keyCol)
    val vIdx = schema.fieldIndex(valueCol)
    val outSchema = schema.add(outCol, LongType, nullable = false)
    df.where(col(keyCol).isNotNull)
      .groupByKey(rowKeyFn(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[PartState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[PartState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = orderedRows(rows, tsIdx, eidIdx)
            if (ordered.isEmpty) Iterator.empty
            else {
              var st = state.getOption.getOrElse(PartState(0L, 0L, None, 0L))
              val out = ordered.map { r =>
                val v: Option[String] =
                  if (r.isNullAt(vIdx)) None else Some(String.valueOf(r.get(vIdx)))
                if (st.idx == 0L || v != st.lastVal)
                  st = st.copy(lastVal = v, idx = st.idx + 1)
                Row.fromSeq(r.toSeq :+ st.idx)
              }
              val last = ordered.last
              st = st.copy(
                tMs = last.getAs[java.sql.Timestamp](tsIdx).getTime,
                eid = if (eidIdx >= 0 && !last.isNullAt(eidIdx))
                  last.getLong(eidIdx) else 0L)
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.tMs, state.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }(Encoders.product[PartState], Encoders.row(outSchema))
  }

  /** Ring twin serving BOTH bounded sequence verbs: state is the last
    * `cap` values per key (rows, not non-null values). `mode` selects
    * the emission:
    *  - "sliding": `outCol` = fn over the last `cap` rows INCLUDING the
    *    current one (slidingWindow(events=cap));
    *  - "lag": `outCol` = the value of the row `cap` back (neighbor
    *    (distance=cap)); NULL when the key hasn't seen that many rows.
    */
  def ring(df: DataFrame, keyCol: String, valueCol: String, cap: Int,
           mode: String, fn: String, outCol: String): DataFrame = {
    require(cap >= 1, s"ring: cap must be >= 1, got $cap")
    require(Set("sliding", "lag")(mode), s"ring: bad mode '$mode'")
    require(Set("sum", "count", "min", "max")(fn),
      s"streaming slidingWindow supports sum|count|min|max, got '$fn'")
    val (schema, tsIdx, eidIdx, keyIdx, vIdx) = prep(df, keyCol, valueCol)
    val outSchema = schema.add(outCol, LongType, nullable = true)
    // lag(distance=cap) needs cap+1 rows in hand (the current one plus
    // cap back); sliding(events=cap) needs cap including the current
    val keep = if (mode == "lag") cap + 1 else cap
    df.where(col(keyCol).isNotNull)
      .groupByKey(rowKeyFn(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[RingState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[RingState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = orderedRows(rows, tsIdx, eidIdx)
            if (ordered.isEmpty) Iterator.empty
            else {
              var vs = state.getOption.map(_.vs.toVector).getOrElse(Vector.empty)
              val out = ordered.map { r =>
                val v: Option[Long] =
                  if (r.isNullAt(vIdx)) None else Some(r.getLong(vIdx))
                vs = (vs :+ v).takeRight(keep)
                val emit: Any = mode match {
                  case "lag" =>
                    // the row cap back = head of a FULL ring
                    if (vs.size == keep) vs.head.orNull else null
                  case "sliding" =>
                    val present = vs.flatten
                    fn match {
                      case "count" => present.size.toLong
                      case _ if present.isEmpty => null
                      case "sum" => present.sum
                      case "min" => present.min
                      case "max" => present.max
                    }
                }
                Row.fromSeq(r.toSeq :+ emit)
              }
              val last = ordered.last
              val st = RingState(
                last.getAs[java.sql.Timestamp](tsIdx).getTime,
                if (eidIdx >= 0 && !last.isNullAt(eidIdx))
                  last.getLong(eidIdx) else 0L,
                vs)
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.tMs, state.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }(Encoders.product[RingState], Encoders.row(outSchema))
  }
}
