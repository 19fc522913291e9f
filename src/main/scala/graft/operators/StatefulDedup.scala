package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the DSL's `dedup(f1, …, limit=n)` for n > 1 — the
  * capacity-n generalization of `dropDuplicatesWithinWatermark` (which
  * stays the n = 1 plan: native state-store dedup, no function shim).
  *
  * Per key (the dedup fields), state is the IDENTITIES of the distinct
  * rows already emitted — at most n (ts-millis, event_id) pairs, tens of
  * bytes, the [[StatefulRate]] bounded-state discipline. A row whose
  * identity is already in state is a redelivery and collapses silently;
  * a new identity is emitted while fewer than n have been, then the key
  * is saturated and further distinct rows drop. State expires via
  * `EventTimeTimeout` once the watermark passes the key's newest seen
  * event time — the same bound `dropDuplicatesWithinWatermark` applies,
  * with the same documented trade: a redelivery arriving after expiry
  * re-emits.
  *
  * Semantics vs the batch verb (n most recent by (ts, event_id) desc
  * over the finished table): an unbounded stream cannot know "most
  * recent", and append mode cannot retract, so the streaming twin keeps
  * the FIRST n distinct arrivals per key — exactly the n = 1 twin's
  * first-vs-latest divergence, generalized. The two agree when a key
  * has at most n distinct events (redeliveries being identical rows —
  * the at-least-once case the verb exists for), or when arrival order
  * presents the n newest first. Within one micro-batch, rows are
  * ordered by (ts desc, event_id desc) before admission — the batch
  * verb's recency preference applied to the only bounded scope a
  * stream has — so a single-batch burst over capacity keeps its newest
  * n, not an arbitrary n.
  */
object StatefulDedup {
  /** Identities of the ≤ n rows emitted for one key: event-time millis
    * (Long.MinValue for a null ts — such rows have no event-time
    * position but still carry identity) and the event_id tiebreak.
    * When the stream has no event_id column, the second component is a
    * deterministic full-row content hash instead (stable across JVM
    * restarts, so checkpoint resume keeps collapsing redeliveries) —
    * two genuinely different rows sharing a timestamp then stay
    * distinct, as the batch twin keeps them; only identical
    * redeliveries collapse. With event_id present, (ts, event_id) IS
    * row identity by the data model's convention. */
  case class SeenIds(ids: List[(Long, Long)])

  def keepFirstN(df: DataFrame, keys: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"keepFirstN needs n >= 1, got $n")
    val schema = df.schema
    val tsIdx = schema.fieldIndex("ts")
    val eidIdx = schema.fieldNames.indexOf("event_id")
    val keyIdxs = keys.map(schema.fieldIndex)
    df.groupByKey { r: Row =>
        // NUL prefix keeps a null key part distinct from the string
        // "null"; \u0001 separates parts so ("a","bc") != ("ab","c")
        keyIdxs.map(i =>
          if (r.isNullAt(i)) "\u0000" else "v" + String.valueOf(r.get(i)))
          .mkString("\u0001")
      }(Encoders.STRING)
      .flatMapGroupsWithState[SeenIds, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[SeenIds]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def idOf(r: Row): (Long, Long) = {
              val t = if (r.isNullAt(tsIdx)) Long.MinValue
                else r.getAs[java.sql.Timestamp](tsIdx).getTime
              val e = if (eidIdx >= 0 && !r.isNullAt(eidIdx))
                r.get(eidIdx) match {
                  case m: java.lang.Number => m.longValue()
                  case _ => 0L
                }
              // no event_id column: identify the row by its CONTENT so
              // distinct same-ts rows survive (the batch twin keeps
              // both) while byte-identical redeliveries still collapse.
              // MurmurHash3 is seed-free and stable across JVMs, so a
              // checkpoint-resumed query keeps recognizing redeliveries
              // (same NUL/"v"-prefix field encoding as the group key: a
              // null field stays distinct from the string "null" and
              // ("a","bc") from ("ab","c"))
              else scala.util.hashing.MurmurHash3.stringHash(
                (0 until r.length).map(i =>
                  if (r.isNullAt(i)) "\u0000"
                  else "v" + String.valueOf(r.get(i))).mkString("\u0001")).toLong
              (t, e)
            }
            // bounded (one micro-batch of one key), so the sort is safe —
            // and required: Spark guarantees no intra-group order, and the
            // batch verb prefers recency, so admission within the batch
            // runs newest-first by (ts, event_id). Reverse Ordering, NOT
            // key negation: -Long.MinValue overflows back to MinValue and
            // would promote null-ts rows to newest; under reverse
            // ordering the MinValue sentinel sorts last, the batch
            // verb's NULLS-LAST
            val ordered = rows.toVector.map(r => (idOf(r), r))
              .sortBy { case (id, _) => id }(Ordering[(Long, Long)].reverse)
            var seen = state.getOption.map(_.ids).getOrElse(Nil)
            val out = ordered.flatMap { case (id, r) =>
              if (seen.contains(id)) None          // redelivery collapses
              else if (seen.size < n) { seen ::= id; Some(r) }
              else None                            // key saturated
            }
            state.update(SeenIds(seen))
            // expire once the watermark passes the newest identity seen:
            // the dropDuplicatesWithinWatermark bound. Timeout must sit
            // strictly ahead of the current watermark or Spark rejects it
            // (every seen ts already behind ⇒ state is expirable now).
            val newest = seen.map(_._1).max
            state.setTimeoutTimestamp(
              math.max(newest, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }(Encoders.product[SeenIds], Encoders.row(schema))
  }
}
