package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Distributed Bloom filter, built and probed entirely with codegen'd
  * builtins — the mergeable-sketch membership gate for 100 TB
  * decontamination joins.
  *
  * Why it matters at scale: the exact eval-overlap gate ([[graft.queries.PipelineQueries.xDecontam]])
  * broadcasts the DISTINCT eval-set n-grams. Eval suites are small
  * relative to the corpus but not tiny in absolute terms — 10^8 grams ×
  * ~30 bytes is multi-GB, past the comfortable broadcast budget of a
  * 1000-executor cluster. A Bloom filter over the same grams is a FIXED
  * 2^20-bit bitmap (128 KiB) whatever the eval set's size, it
  * partial-aggregates map-side (bitwise OR is associative and
  * commutative), and a probe is k hash-and-test-bit ops on builtins
  * (`xxhash64`, `shiftright`, `&`) — whole-stage codegen, no UDF.
  *
  * Bloom filters admit false positives and zero false negatives, so the
  * membership test is a PRE-FILTER, not the verdict: survivors still
  * flow through the exact equi-join, which at that point sees only the
  * true overlap plus an ε of false positives (ε ≈ (kn/m)^k) instead of
  * the whole corpus gram stream. Output is therefore bit-identical to
  * the unfiltered plan — the bloom twin shares its sibling's oracle.
  *
  * Build side: [[Bloom.positions]] maps a gram to its k bit positions
  * (array of longs); [[BloomOr]] ORs them into the bitmap with one
  * fixed-size buffer per partition partial. Probe side:
  * [[Bloom.mightContain]] recomputes the same positions and tests each
  * bit with `element_at` + `shiftright` (via `call_function`, which
  * accepts Column shift amounts where the Scala wrapper takes only a
  * literal).
  */
object Bloom {
  /** Bitmap width in bits (power of two) and words. */
  val M_BITS: Long = 1L << 20
  val WORDS: Int = (M_BITS / 64L).toInt
  /** Number of hash functions. */
  val K: Int = 5

  /** The k bit positions of a gram: xxhash64 seeded by the probe index
    * via an extra hashed column. Both build and probe sides call this,
    * so agreement is by construction.
    */
  def positions(gram: Column): Column =
    array((0 until K).map(i => pmod(xxhash64(gram, lit(i)), lit(M_BITS))): _*)

  /** Probe: AND of the k bit tests against `bitmap` (array<bigint> of
    * [[WORDS]] words, 1-based for element_at). Codegen'd builtins only.
    */
  def mightContain(bitmap: Column, gram: Column): Column =
    (0 until K).map { i =>
      val pos = pmod(xxhash64(gram, lit(i)), lit(M_BITS))
      val word = element_at(bitmap, (pos / 64).cast("int") + lit(1))
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}

/** Typed Aggregator: OR the per-gram bit positions into one bitmap.
  *
  * Buffer is the full fixed-size bitmap (128 KiB of longs); `reduce`
  * sets bits, `merge` is word-wise OR — both associative, so Spark
  * plans a map-side partial (one bitmap per partition) and shuffles
  * exactly one bitmap per partition, never the gram stream.
  */
object BloomOr extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.ofDim[Long](Bloom.WORDS)

  override def reduce(buf: Array[Long], positions: Seq[Long]): Array[Long] = {
    positions.foreach { pos =>
      buf((pos >>> 6).toInt) |= (1L << (pos & 63L))
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
