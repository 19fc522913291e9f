package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: bounded top-k of (id, score) pairs, ordered score
  * DESC with id ASC as the deterministic tie-break — the partial-top-k
  * building block of scale-safe exact KNN.
  *
  * Top-k is mergeable (top-k of a union = top-k of the concatenated
  * top-ks), so this runs as a map-side partial aggregation: every
  * candidate partition reduces its rows to at most k pairs per group
  * BEFORE the exchange, the shuffle carries |groups|·k rows per
  * partition instead of |groups|·|candidates|, and the final merge is
  * exact. That replaces the window-rank formulation (which must shuffle
  * every scored pair to sort it) and — used probe-side-broadcast in
  * [[graft.operators.Knn.bruteForceTopK]] — removes the full-table
  * candidate broadcast that breaks outright at the 8 GB limit at scale.
  *
  * The buffer is kept sorted best-first and never exceeds k elements;
  * k is a per-query constant (1–10), so the insert cost is a handful of
  * comparisons per row.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // strict ordering: score desc, id asc; ids are unique per group, so
  // no two distinct elements ever compare equal
  private def beats(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: Seq[(Long, Double)] = Nil

  override def reduce(buf: Seq[(Long, Double)], v: (Long, Double)): Seq[(Long, Double)] =
    if (buf.lengthCompare(k) >= 0 && beats(buf.last, v)) buf
    else {
      val (better, worse) = buf.span(beats(_, v))
      (better ++ (v +: worse)).take(k)
    }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    // both sides sorted best-first: linear merge, stop at k
    val out = Seq.newBuilder[(Long, Double)]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
