package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: element-wise sum of quantized (integer) vectors —
  * the mergeable building block of deterministic distributed means.
  *
  * Floating-point sums depend on accumulation order, so a distributed
  * centroid mean can differ run to run (and can never hash-match a
  * serial oracle). Quantizing each component to an exact integer first
  * makes the sum ORDER-INDEPENDENT: any partial/merge tree yields the
  * same total, the mean is one exact division at the end, and a SQL
  * oracle replays it bit-for-bit. Runs as a map-side partial aggregation
  * with one fixed-width array per group per partition shuffled — no
  * per-dimension explode.
  */
object QVecSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.empty

  private def add(buf: Array[Long], v: Seq[Long]): Array[Long] =
    if (buf.isEmpty) v.toArray
    else {
      require(buf.length == v.length,
        s"vector width mismatch: ${buf.length} vs ${v.length}")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = add(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    // either side may be the zero buffer (empty partitions emit empty
    // partials)
    if (a.isEmpty) b else if (b.isEmpty) a else add(a, b.toSeq)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
