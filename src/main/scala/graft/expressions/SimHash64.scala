package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** 64-bit SimHash of a token array, returned as a 64-char '0'/'1' string
  * (a bit string, not a bigint, so the sign bit can't overflow and the
  * DuckDB oracle can rebuild it with string_agg).
  *
  * Definition (replayed verbatim by the x_simhash oracle): token hash =
  * first 16 hex chars of md5(word) = 64 bits, bit i of hex char c is
  * `(value(c) >> (3 - i%4)) & 1`; each token adds +1/-1 per bit
  * (multiplicity counts); output bit i is '1' iff the sum is strictly
  * positive. Near-duplicate documents land at small Hamming distance.
  *
  * Single pass per row (digest reused), CodegenFallback for the same
  * reason as [[ShingleMinHash]] — per-row work dwarfs the call overhead.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](64)
    var w = 0
    val n = arr.numElements()
    while (w < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(w).toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 bytes = first 16 hex chars = 64 bits, MSB-first per nibble
      var i = 0
      while (i < 64) {
        val hexChar = (if (i % 8 < 4) (d(i / 8) >> 4) else d(i / 8)) & 0xf
        val bit = (hexChar >> (3 - (i % 4))) & 1
        sums(i) += (if (bit == 1) 1 else -1)
        i += 1
      }
      w += 1
    }
    val out = new Array[Char](64)
    var i = 0
    while (i < 64) { out(i) = if (sums(i) > 0) '1' else '0'; i += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private val ident = new FunctionIdentifier("graft_simhash64")

  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
}
