package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Hilbert-curve index d of a (x, y) cell on the
  * 2^bits × 2^bits grid (the space-filling-curve alternative to the Morton
  * interleave behind multi-dimensional clustering — Hilbert keeps ADJACENT
  * d values adjacent in space, with none of the Z-curve's long jumps).
  *
  * The transform is the classic O(bits) quadrant-fold loop (accumulate the
  * quadrant offset s²·((3·rx) ⊕ ry), then reflect/transpose the low bits
  * into the next sub-square's frame). A loop is exactly what a Column-level
  * formulation cannot express without either a per-step projection chain or
  * an exponentially duplicated CASE tree — so this is the codegen-Expression
  * preference point (SURVEY §2.10 (b)): one expression node, a tight branch-
  * free-ish Java loop inside whole-stage codegen, and an interpreted
  * `nullSafeEval` twin for non-codegen paths. Pure integer shifts/masks —
  * exact and identical in any engine, which is what lets the DuckDB oracle
  * state the same curve as an unrolled CTE chain.
  *
  * Inputs must already be quantized to [0, 2^bits): out-of-range coordinates
  * would alias (the loop only inspects the low `bits` bits), so the caller
  * owns range reduction — q200 quantizes by data range first.
  */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert_d bits out of range: $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_d expects two BIGINT inputs, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertD {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HilbertD].getName, "hilbert_d")
}
