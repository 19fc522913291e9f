package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming twin of [[LogAnalytics.funnelStages]] — the real-time
  * funnel: per key, emit a progress row the moment a stage completes
  * (stage i = first event of type i strictly after stage i−1 and within
  * `stepWindowMs` of it; stage 0 unconditioned). A single event-time-
  * ordered pass makes "first qualifying event" ≡ the batch twin's
  * conditional-min chain, so on in-order (or drained in-order) input the
  * emitted stage set equals the batch stage vector — proven in
  * StreamingSpec.
  *
  * State per key is the completed-stage times only (≤ `stages.length`
  * longs — the [[StatefulRate]] bounded-state discipline). Rows inside a
  * micro-batch are sorted by (ts, event_id) before admission (Spark
  * guarantees no intra-group order; the batch twin is an event-time
  * construct). State expires via EventTimeTimeout once no further
  * progress is possible: a completed funnel expires at the next
  * watermark tick, an in-flight one once the watermark passes
  * `t_last + stepWindowMs` (the next stage's admission deadline).
  *
  * Expiry makes the streaming semantics ATTEMPT-based where the batch
  * twin is global-min-based: after a stalled funnel's deadline passes,
  * a later stage-0 event starts a NEW attempt and emits again (dedup
  * of attempts forever would need per-key state forever). On in-order
  * arrival every batch emission still appears in the stream — an
  * admissible stage-i event (ts ≤ t_{i-1} + window) arrives while the
  * watermark, which lags max event time, is still short of the
  * deadline — so the stream is a SUPERSET of the batch twin whose
  * extra rows are exactly the restarted attempts, and its FIRST
  * stage-0 emission per key is the batch t0. Both properties are
  * spec-proven on randomized batch splits; exact set equality holds
  * when each key's progress fits one state lifetime (the deterministic
  * spec).
  *
  * Divergence from batch, also watermark-bounded: a late-but-admissible
  * event with an EARLIER event time than an already-completed stage
  * cannot retract the emitted row (append mode) — the batch twin would
  * have used the earlier time. Agreement therefore holds on event-time-
  * ordered arrival, the same contract every streaming twin here
  * documents.
  */
object StatefulFunnel {
  /** Completed stage times, newest FIRST (times.length = stages done). */
  case class FunnelState(times: List[Long])

  /** `df` must carry `ts` (event time), `event_type`, a non-null LONG
    * key column `keyCol`, and optionally `event_id` (intra-batch
    * tiebreak). Output: (k, stage, stage_idx, t_ms) append rows.
    */
  def progress(df: DataFrame, keyCol: String, stages: Seq[String],
               stepWindowMs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val schema = df.schema
    val tsIdx = schema.fieldIndex("ts")
    val typeIdx = schema.fieldIndex("event_type")
    val eidIdx = schema.fieldNames.indexOf("event_id")
    val keyIdx = schema.fieldIndex(keyCol)
    val outSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("stage", StringType, nullable = false),
      StructField("stage_idx", IntegerType, nullable = false),
      StructField("t_ms", LongType, nullable = false)))
    df.where(col(keyCol).isNotNull)
      .groupByKey((r: Row) => r.getLong(keyIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, rows: Iterator[Row], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var times = state.getOption.map(_.times).getOrElse(Nil)
            // bounded (one micro-batch of one key): sort by event time,
            // event_id tiebreak — the batch twin's ordering
            val ordered = rows.toVector
              .filter(r => !r.isNullAt(tsIdx) && !r.isNullAt(typeIdx))
              .map { r =>
                val t = r.getAs[java.sql.Timestamp](tsIdx).getTime
                val e = if (eidIdx >= 0 && !r.isNullAt(eidIdx))
                  r.getLong(eidIdx) else 0L
                (t, e, r.getString(typeIdx))
              }
              .sortBy(t => (t._1, t._2))
            val out = Vector.newBuilder[Row]
            for ((tms, _, typ) <- ordered) {
              val i = times.length
              if (i < stages.length && typ == stages(i) &&
                  (i == 0 || (tms > times.head &&
                    tms - times.head <= stepWindowMs))) {
                times ::= tms
                out += Row(k, stages(i), i, tms)
              }
            }
            if (times.nonEmpty) {
              state.update(FunnelState(times))
              // no-further-progress deadline; must sit strictly ahead of
              // the current watermark or Spark rejects the timestamp
              val expire =
                if (times.length == stages.length)
                  state.getCurrentWatermarkMs() + 1
                else math.max(times.head + stepWindowMs,
                  state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(expire)
            }
            out.result().iterator
          }
      }(Encoders.product[FunnelState], Encoders.row(outSchema))
  }
}
