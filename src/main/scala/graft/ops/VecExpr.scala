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

/** Whole-table hyperplane signature in ONE compact expression: the sign
  * bits of `planes·vec` OR'd into an int bucket. Replaces the unrolled
  * `bits × dot(vec, array(lit…))` formulation whose generated code grew
  * with bits × dim (janino compile time dominated small inputs — the
  * round-3 s2 regression); here the plane matrix travels as a codegen
  * REFERENCE OBJECT and the generated code is a fixed-size nested loop, so
  * compile cost is constant in (bits, dim) while the arithmetic is
  * BIT-IDENTICAL to the old shape: the same left-to-right per-plane fold
  * over the same widened doubles, strict `> 0` sign test, bit i = plane i.
  *
  * Null semantics replicate the old `when(dot > 0, bit).otherwise(0)`
  * chain exactly: a null vector, null element, or dimension mismatch made
  * every per-plane dot null → every bit took the otherwise(0) arm → the
  * signature was 0 (never null).
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // plan-time rejection: the dim guard below checks only planes(0), so a
  // ragged matrix would AIOOBE deep inside janino-generated code
  require(planes.forall(_.length == planes.headOption.map(_.length).getOrElse(0)),
    "hyperplane matrix must be rectangular (every plane the same dimension)")

  // case-class equality on Array is REFERENCE equality — without a
  // content-based override, two structurally-identical instances (e.g.
  // after an expression serialization round-trip) are never semanticEqual,
  // so CSE / exchange reuse / cached-plan matching silently miss
  override def equals(o: Any): Boolean = o match {
    case h: HyperplaneSig => child == h.child &&
      planes.length == h.planes.length &&
      planes.indices.forall(b => java.util.Arrays.equals(planes(b), h.planes(b)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def prettyName: String = "vec_hyperplane_sig"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (planes.nonEmpty && n != planes(0).length) return 0
    var d = 0
    while (d < n) { if (a.isNullAt(d)) return 0; d += 1 }
    var sig = 0
    var b = 0
    while (b < planes.length) {
      var s = 0.0
      val p = planes(b)
      var i = 0
      while (i < n) { s += a.getDouble(i) * p(i); i += 1 }
      if (s > 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    val (v, n, ok, d, b, s, i) = (ctx.freshName("v"), ctx.freshName("n"),
      ctx.freshName("ok"), ctx.freshName("d"), ctx.freshName("b"),
      ctx.freshName("s"), ctx.freshName("i"))
    val javaCode =
      code"""
         |${c.code}
         |int ${ev.value} = 0;
         |if (!${c.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $v = ${c.value};
         |  final int $n = $v.numElements();
         |  boolean $ok = $mat.length == 0 || $n == $mat[0].length;
         |  if ($ok) {
         |    for (int $d = 0; $d < $n; $d++) {
         |      if ($v.isNullAt($d)) { $ok = false; break; }
         |    }
         |  }
         |  if ($ok) {
         |    for (int $b = 0; $b < $mat.length; $b++) {
         |      double $s = 0.0;
         |      final double[] ${s}_p = $mat[$b];
         |      for (int $i = 0; $i < $n; $i++) $s += $v.getDouble($i) * ${s}_p[$i];
         |      if ($s > 0) ${ev.value} |= (1 << $b);
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = javaCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED-ascending long arrays (the dedup-verify hot
  * kernel): one primitive merge scan, no hash set, no materialized
  * intersection array. Replaces `size(array_intersect(a, b))`, which builds
  * a per-row hash set AND allocates the intersection array only to take its
  * length — measured the dominant cost of the d2 verify stage (r6). Counts
  * are identical for the duplicate-free sorted sets the dedup paths build
  * (per-doc distinct shingle tokens); both inputs MUST be sorted ascending
  * and duplicate-free — callers own that invariant (sort_array over
  * collect_list of per-doc-distinct postings).
  *
  * Null semantics: null array → null (the pre-kernel pipeline never feeds
  * one — sets come from an inner join — but mirror array_intersect anyway);
  * null ELEMENTS cannot occur (md5-derived tokens) and are skipped
  * defensively.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x < y) i += 1
        else if (x > y) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (na, nb, i, j, c, x, y) = (ctx.freshName("na"), ctx.freshName("nb"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final long $x = $a.getLong($i);
         |    final long $y = $b.getLong($j);
         |    if ($x < $y) { $i++; }
         |    else if ($x > $y) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
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
  def hyperplaneSig(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(asD(vec)), planes))
  /** |A ∩ B| of two sorted-ascending duplicate-free long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
}
