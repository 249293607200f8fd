package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two ARRAY<FLOAT> columns in
  * DOUBLE precision, with whole-stage codegen (SURVEY §2.10's extension
  * point, preference order (b): a codegen'd Expression beats a Scala UDF).
  *
  * Semantics match the HOF formulation used by the similarity queries —
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, (s,p) -> s+p)`
  * — exactly, for ALL inputs: same sequential left-to-right IEEE adds on the
  * dense path, and NULL whenever the HOF would return NULL — i.e. when the
  * lengths differ (zip_with pads the short side with nulls, nulling the fold)
  * or any element is null. That totality is what lets RewriteDotProduct swap
  * this in for the HOF unconditionally. No intermediate zipped array, no
  * boxing: the generated code reads primitive floats straight out of the
  * columnar ArrayData.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal => null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects two ARRAY<FLOAT> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  // null even for non-null inputs (ragged lengths / null elements)
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProductF32 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotProductF32].getName, "dot_f32")
}
