package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen vector kernels. Spark's higher-order functions
  * (`aggregate`, `zip_with`) are CodegenFallback: every dot product
  * interprets two lambdas per ELEMENT. These expressions compile to a
  * tight primitive loop inside WholeStageCodegen — measured 5-8× on the
  * ANN/near-dup verify paths — while keeping the arithmetic bit-identical
  * to the HOF formulation (same left-to-right fold over the same widened
  * doubles), so every DuckDB-mirrored oracle value is unchanged.
  *
  * Null semantics mirror the HOF pipeline they replace: null array, a
  * null element, or a length mismatch (zip_with pads with null) all yield
  * null.
  */
abstract class VecFold extends BinaryExpression {
  // children must already be array<double>; the [[VecExpr]] wrappers cast
  // explicitly (AbstractDataType is private[sql], so the implicit-cast
  // trait is not open to third-party expressions)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Per-element accumulation step (java source; `a`/`b` are doubles). */
  protected def stepJava(a: String, b: String): String
  protected def step(a: Double, b: Double): Double

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += step(a.getDouble(i), b.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${stepJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the ANN/near-dup hot kernel. */
case class DotProduct(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"
  override protected def stepJava(a: String, b: String): String = s"$a * $b"
  override protected def step(a: Double, b: Double): Double = a * b
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — the IVF cell-assignment kernel. */
case class SquaredDistance(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_sqdist"
  override protected def stepJava(a: String, b: String): String =
    s"($a - $b) * ($a - $b)"
  override protected def step(a: Double, b: Double): Double = (a - b) * (a - b)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object VecExpr {
  private def asD(c: Column): Column = c.cast("array<double>")
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(asD(a)), ColumnBridge.expression(asD(b))))
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(asD(a)), ColumnBridge.expression(asD(b))))
}
