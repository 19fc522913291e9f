package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: element-wise minimum of MinHash signature arrays.
  *
  * MinHash is a mergeable sketch — the signature of a UNION of documents
  * is the element-wise minimum of their signatures — so this aggregator
  * computes a group-level near-dup signature (per language, per source,
  * per shard) without re-hashing any text: `union(sigs)` over a group is
  * exactly `minhash(concat of the group's shingle sets)`.
  *
  * Scale shape: the buffer is one fixed-size string array per group;
  * `reduce`/`merge` are both element-wise min, so Spark runs it as a
  * partial (map-side) aggregation followed by a tiny shuffle of one
  * signature per group per partition — the same plan shape as a built-in
  * min. The SURVEY §2.2 custom-UDAF surface, done the typed
  * `Aggregator[IN, BUF, OUT]` way.
  */
object SigUnion extends Aggregator[Seq[String], Array[String], Seq[String]] {
  override def zero: Array[String] = Array.empty

  private def mergeInto(buf: Array[String], sigs: Seq[String]): Array[String] =
    if (buf.isEmpty) sigs.toArray
    else {
      require(buf.length == sigs.length,
        s"signature width mismatch: ${buf.length} vs ${sigs.length}")
      var i = 0
      while (i < buf.length) {
        if (sigs(i) < buf(i)) buf(i) = sigs(i)
        i += 1
      }
      buf
    }

  override def reduce(buf: Array[String], sigs: Seq[String]): Array[String] =
    mergeInto(buf, sigs)

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    // either side may be the zero buffer: an EMPTY PARTITION's partial
    // arrives as Array.empty and must not trip the width check
    if (a.isEmpty) b else if (b.isEmpty) a else mergeInto(a, b.toSeq)

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
