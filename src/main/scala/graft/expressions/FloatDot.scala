package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * Semantically identical to the higher-order-function formulation in
  * [[graft.functions.Vectors.dot]] — each element widened to double,
  * multiplied, accumulated LEFT-TO-RIGHT — so results are bit-identical
  * to the DuckDB oracle's explicit-SQL twin. The difference is cost: the
  * HOF version materializes an intermediate array per pair and walks it
  * with per-element virtual calls; this compiles to a tight primitive
  * loop inside whole-stage codegen. On the KNN cross joins (|probe|·|n|
  * pairs) that is the entire inner loop of the query.
  *
  * Nulls: null if either array is null (BinaryExpression default); null
  * ELEMENTS inside a vector are treated as 0.0 (embeddings are dense;
  * only malformed rows would hit this).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatDot {
  private val ident = new FunctionIdentifier("graft_dot")

  /** Idempotent per-session registration; afterwards `expr("graft_dot(a,b)")`
    * resolves in any DataFrame/SQL context of the session.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(ident)) {
      spark.sessionState.functionRegistry.registerFunction(
        ident,
        new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
        (children: Seq[Expression]) => FloatDot(children(0), children(1)))
    }
}
