package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Misra-Gries frequent-items sketch: mergeable top-k with a fixed-size
  * buffer — the 100 TB twin of `groupBy(dim).count.orderBy.limit(k)`.
  *
  * Why it matters at scale: exact top-k first materializes the FULL
  * per-key count relation, which for a high-cardinality dim (URLs, user
  * ids, n-grams) shuffles one row per distinct key. Misra-Gries keeps at
  * most `capacity` counters per partial, and its merge (sum counters,
  * then subtract the (capacity+1)-th largest and drop non-positives) is
  * associative — the shape Spark plans as a map-side partial plus a
  * shuffle of ONE bounded summary per partition, independent of key
  * cardinality.
  *
  * Guarantees (Misra-Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): each reported count is an
  * UNDERESTIMATE of the true count by at most n/(capacity+1) where n is
  * the stream length, and every key with true count > n/(capacity+1) is
  * guaranteed present. When the total number of distinct keys is at most
  * `capacity`, no decrement ever fires and every count is EXACT — that
  * regime is what lets the query twin share its exact sibling's oracle
  * at fixture scale while the sketch remains the honest plan at 100 TB.
  *
  * The buffer is an immutable Map (encoder-friendly); `finish` emits
  * (key, count) tuples for the caller to explode/rank.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < capacity => buf.updated(key, 1L)
      case None =>
        // classic MG step: the new key and every counter give up one.
        // The O(capacity) rebuild is amortized O(1) per row: each
        // decrement round subtracts `capacity` total count mass, only
        // one unit of mass enters per row, so over a stream of n rows
        // at most n/capacity rounds fire.
        buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from all, keep positives
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
