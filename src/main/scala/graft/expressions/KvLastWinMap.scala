package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused KV-array flatten with LAST-WIN duplicate keys — the connector's
  * R5 operator (reference app.py flattens the audit KeyValues list into a
  * dict, later entries overwriting earlier) as ONE native pass.
  *
  * Semantically identical to the declarative form it replaces
  * (`map_from_entries(transform(kv, e => struct(e("Key"),
  * e("ValueString"))))` under spark.sql.mapKeyDedupPolicy=LAST_WIN,
  * differentially tested): duplicate keys keep the FIRST occurrence's
  * position with the LAST occurrence's value (Spark's ArrayBasedMapBuilder
  * convention), NULL values are kept, a NULL entry or NULL key raises —
  * the same error class of behavior as map_from_entries.
  *
  * The declarative chain pays an interpreted `transform` lambda per row
  * plus map_from_entries' builder; worse, extracting two keys from the
  * result either re-evaluates the whole chain per key (projection
  * collapse) or needs a Generate barrier per row to stop it. This
  * expression is cheap enough to evaluate once inside whole-stage
  * codegen — repeated extracts dedup via subexpression elimination, so
  * the Generate barrier goes away entirely.
  *
  * Input: array<struct<Key: string, ValueString: string>> (the audit KV
  * shape) — the two fields are taken POSITIONALLY (0 = key, 1 = value),
  * matching what the transform lambda selected.
  */
case class KvLastWinMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, StringType,
    valueContainsNull = true)
  override def prettyName: String = "graft_kv_lastwin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.length == 2 && st(0).dataType == StringType &&
           st(1).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "graft_kv_lastwin expects array<struct<string,string>>, got " +
        other.simpleString)
  }

  override protected def nullSafeEval(input: Any): Any =
    KvLastWinMap.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.KvLastWinMap.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KvLastWinMap {
  private val ident = new FunctionIdentifier("graft_kv_lastwin")

  /** One pass; duplicate key → value overwritten in place (first
    * position, last value). KV arrays are small (an audit record's
    * fields), so the linear key scan beats hashing.
    */
  def compute(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val keys = new Array[AnyRef](n)
    val values = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        throw new IllegalArgumentException(
          "graft_kv_lastwin: KV entry cannot be null")
      }
      val e = arr.getStruct(i, 2)
      if (e.isNullAt(0)) {
        throw new IllegalArgumentException(
          "graft_kv_lastwin: map key cannot be null")
      }
      // copy: the inputs may point into a reused row buffer, and the
      // built map can be consulted across expression evaluations
      val k = e.getUTF8String(0)
      val v = if (e.isNullAt(1)) null else e.getUTF8String(1).copy()
      var j = 0
      var found = -1
      while (found < 0 && j < m) {
        if (keys(j).asInstanceOf[UTF8String].equals(k)) found = j
        j += 1
      }
      if (found >= 0) values(found) = v
      else { keys(m) = k.copy(); values(m) = v; m += 1 }
      i += 1
    }
    val ks: Array[AnyRef] = if (m == n) keys else java.util.Arrays.copyOf(keys, m)
    val vs: Array[AnyRef] = if (m == n) values else java.util.Arrays.copyOf(values, m)
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[KvLastWinMap].getName, "graft_kv_lastwin"),
        (children: Seq[Expression]) => KvLastWinMap(children.head))
    }
}
