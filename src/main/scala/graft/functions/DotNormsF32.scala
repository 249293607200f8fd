package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StructField, StructType}

/** Fused similarity kernel (round 7): dot product AND both squared norms of
  * two ARRAY<FLOAT> columns in ONE traversal, returned as
  * STRUCT<dot: DOUBLE, na: DOUBLE, nb: DOUBLE>.
  *
  * The ANN tier needs all three quantities per candidate pair (cosine =
  * dot/(√na·√nb); L2² = na + nb − 2·dot), and composing them from
  * [[DotProductF32]] costs three passes over both arrays per pair. This
  * expression reads each float exactly once and feeds three accumulators —
  * and because each accumulator performs the SAME left-to-right IEEE add
  * sequence as its standalone loop, every field is bit-identical to the
  * three-call formulation (and therefore to the HOF/DuckDB oracles). NULL
  * exactly when dot_f32 is NULL: ragged lengths or a null element.
  *
  * Physical-plan note: deriving several fields from one call relies on
  * whole-stage codegen's subexpression elimination to evaluate the kernel
  * once per row after project-collapse duplicates it per field — PlanCheck
  * cannot see that, so FunctionsSpec pins value parity and the bench pins
  * the win (the kernel dominates ANN scan time regardless: 3 passes → 1).
  */
case class DotNormsF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_norms_f32 expects two ARRAY<FLOAT> inputs, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("dot", DoubleType, nullable = false),
    StructField("na", DoubleType, nullable = false),
    StructField("nb", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "dot_norms_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    new GenericInternalRow(Array[Any](dot, na, nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{$dot, $na, $nb});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotNormsF32 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DotNormsF32].getName, "dot_norms_f32")
}
