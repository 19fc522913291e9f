package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** n-PERMUTATION seeded MinHash of a token array in one pass: permutation
  * `i` of a shingle is `md5("i:" + shingle)`, and the signature is the
  * per-permutation minimum over all 3-word shingles of the document.
  *
  * This is the scale-grade successor of [[ShingleMinHash]]'s rotation
  * family, whose 8-hex-char rotations have period 4 and therefore cap the
  * signature length at k=4 — far below the 16–128 permutations a real
  * near-dup pass needs for banding (b bands × r rows) to control the
  * recall/precision trade. Seeding by PREFIX keeps every permutation an
  * independent md5 draw, and md5 is the one hash both Spark and DuckDB
  * evaluate bit-identically, so the DuckDB oracle can replay signatures
  * exactly (`md5(CAST(i AS VARCHAR) || ':' || shingle)`).
  *
  * Cost model: n digest calls per shingle (a shingle fits one md5 block,
  * so each call is a single compression round). The whole expression is a
  * narrow per-row projection — no shingle arrays materialized, no explode,
  * no shuffle — signatures stay co-located with the scan and the LSH band
  * join remains the only exchange, which is the shape that survives 100 TB.
  *
  * CodegenFallback is deliberate: per-row work (n·shingles md5 calls)
  * dwarfs the virtual call codegen would save, and the digest instance is
  * reused across the row.
  */
case class ShinglePermMinHash(child: Expression, shingleWords: Int, numPerms: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_perm_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (numPerms < 1 || numPerms > 1024) TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_perm_minhash supports 1..1024 permutations, got $numPerms")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_perm_minhash expects array<string>, got ${other.simpleString}")
  }

  // hex encoding is order-preserving byte-for-byte (00→"00" … ff→"ff"),
  // so UNSIGNED lexicographic order on raw digests equals the hex-string
  // order the oracle's varchar min uses
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  // per-instance, not per-row: a pure function of numPerms (transient —
  // rebuilt lazily on the executor after serialization)
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numPerms)(i =>
      s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = Array.tabulate(n)(i => arr.getUTF8String(i).toString)
    val md = MessageDigest.getInstance("MD5")
    // minima are tracked as raw 16-byte digests and hex-encoded ONCE per
    // permutation at the end; the shingle is UTF-8-encoded once, not once
    // per permutation, and digest(buf,…) keeps the loop allocation-free
    val mins = Array.ofDim[Byte](numPerms, 16)
    var filled = false
    val buf = new Array[Byte](16)
    def fold(shingle: String): Unit = {
      val sb = shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var j = 0
      while (j < numPerms) {
        md.update(prefixes(j))
        md.update(sb)
        md.digest(buf, 0, 16)   // writes and resets
        if (!filled || unsignedLess(buf, mins(j)))
          System.arraycopy(buf, 0, mins(j), 0, 16)
        j += 1
      }
      filled = true
    }
    if (n >= shingleWords) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= n - shingleWords) {
        sb.setLength(0)
        var w = 0
        while (w < shingleWords) {
          if (w > 0) sb.append(' ')
          sb.append(words(i + w))
          w += 1
        }
        fold(sb.toString)
        i += 1
      }
    } else {
      fold(words.mkString(" "))
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(HexBytes.toHex(m)): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglePermMinHash {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private val ident = new FunctionIdentifier("graft_shingle_perm_minhash")

  /** Register for `call_function("graft_shingle_perm_minhash", toks, lit(w), lit(n))`. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[ShinglePermMinHash].getName, "graft_shingle_perm_minhash"),
        (children: Seq[Expression]) => ShinglePermMinHash(
          children.head,
          children(1).asInstanceOf[Literal].value.asInstanceOf[Int],
          children(2).asInstanceOf[Literal].value.asInstanceOf[Int]))
    }
}
